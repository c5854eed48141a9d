package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Custom Catalyst expressions for the hot paths where composed built-in
 * HOFs (`transform`/`zip_with`/`aggregate`) are interpreted per element with
 * boxing — measured 10-60× slower than a tight JVM loop at bench scale.
 * Semantics are IDENTICAL to the Column-function formulations in
 * [[graft.text.Text]] / [[graft.dedup.Dedup]] / [[graft.sim.Similarity]]
 * (the DuckDB oracle checks pin this).
 *
 * All are `CodegenFallback`: one virtual call per row into a primitive loop.
 * (Full `doGenCode` is a later optimization; the fallback already removes
 * the per-element interpretation overhead that dominates.)
 */
object Hashing {
  /** First 60 bits of md5 (= first 15 hex chars parsed base-16) — matches
    * `conv(substring(md5(s),1,15),16,10)` and the DuckDB hex-cast oracle. */
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def md5_60(bytes: Array[Byte]): Long = {
    val d = tl.get(); d.reset()
    val h = d.digest(bytes)
    // first 8 bytes big-endian >>> 4 = first 15 hex nibbles
    var hi = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (h(i) & 0xffL); i += 1 }
    hi >>> 4
  }
  /** Both 60-bit halves (nibbles 0-14 and 15-29) of one md5 — two portable
    * hash values for the price of one digest. */
  def md5_60_pair(bytes: Array[Byte]): (Long, Long) = {
    val d = tl.get(); d.reset()
    val h = d.digest(bytes)
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (h(i) & 0xffL); i += 1 }
    while (i < 16) { lo = (lo << 8) | (h(i) & 0xffL); i += 1 }
    ((hi >>> 4), ((hi & 0xfL) << 56) | (lo >>> 8))
  }
  /** Fast non-portable 64-bit mix (splitmix64 over bytes) for the scale path. */
  def fast64(bytes: Array[Byte], seed: Long): Long = {
    var h = seed ^ (bytes.length * 0x9E3779B97F4A7C15L)
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0xBF58476D1CE4E5B9L
      h ^= (h >>> 27); i += 1
    }
    h * 0x94D049BB133111EBL ^ ((h * 0x94D049BB133111EBL) >>> 31)
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Whitespace tokens (Java regex `\s+` split semantics, empties dropped). */
  def tokenize(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0; val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  /** normalize = trim + lowercase + collapse internal whitespace to ' '
    * (matches Text.normalize = trim(regexp_replace(lower(c),"\\s+"," "))). */
  def normalize(s: String): String = {
    val toks = tokenize(s.toLowerCase)
    toks.mkString(" ")
  }
}

/** Span-rule checks in ONE pass over the spans array.
  * Output: struct(mono_bad_offset INT (null = ok), field_bad_offset INT
  * (null = ok), is_empty BOOLEAN). Null input ⇒ (null, null, true).
  * Mirrors Rules.SpanOffsetsMonotonic / SpanFieldConsistency / SpansNonEmpty. */
case class SpanChecks(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("mono_bad_offset", IntegerType, nullable = true),
    StructField("field_bad_offset", IntegerType, nullable = true),
    StructField("is_empty", BooleanType, nullable = false)))
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return InternalRow(null, null, true)
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return InternalRow(null, null, true)
    val spanType = child.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    var monoBad: Any = null
    var fieldBad: Any = null
    var prevOffset = Int.MinValue
    var i = 0
    while (i < n && (monoBad == null || fieldBad == null)) {
      val row = arr.getStruct(i, 4)
      if (row != null) {
        // fields: kind(0), text(1), media_ref(2), offset(3)
        val kind = if (row.isNullAt(0)) null else row.getUTF8String(0)
        val hasText = !row.isNullAt(1)
        val hasRef = !row.isNullAt(2)
        val off = if (row.isNullAt(3)) Int.MinValue else row.getInt(3)
        if (monoBad == null && i > 0 && off <= prevOffset) monoBad = off
        if (fieldBad == null) {
          val isText = kind != null && kind.toString == "text"
          val bad = if (isText) !hasText || hasRef else !hasRef || hasText
          if (bad) fieldBad = off
        }
        prevOffset = off
      }
      i += 1
    }
    InternalRow(monoBad, fieldBad, false)
  }
  override protected def withNewChildInternal(c: Expression): SpanChecks = copy(c)
}

/** One-pass whitespace-token statistics.
  * Output struct: n_tokens INT, n_bpe INT, n_punct INT, n_ws INT, len INT,
  * n_stop INT (lowercased token ∈ stopwords). Null text ⇒ null. */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType), StructField("n_bpe", IntegerType),
    StructField("n_punct", IntegerType), StructField("n_ws", IntegerType),
    StructField("len", IntegerType), StructField("n_stop", IntegerType)))
  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(w => s.add(w)); s
  }
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var nTok = 0; var nBpe = 0; var nPunct = 0; var nWs = 0; var nStop = 0
    var len = 0
    var i = 0; val n = s.length
    var inTok = false; var inAlnum = false
    var tokStart = -1
    def isWsC(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    def isAlnum(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
    while (i < n) {
      val cp = s.codePointAt(i)
      val c = s.charAt(i)
      len += 1
      val ws = Character.charCount(cp) == 1 && isWsC(c)
      if (ws) {
        nWs += 1
        if (inTok) {
          if (stopSet.contains(s.substring(tokStart, i).toLowerCase)) nStop += 1
          inTok = false
        }
        inAlnum = false
      } else {
        if (!inTok) { nTok += 1; inTok = true; tokStart = i }
        val alnum = Character.charCount(cp) == 1 && isAlnum(c)
        if (alnum) { if (!inAlnum) { nBpe += 1; inAlnum = true } }
        else { nBpe += 1; nPunct += 1; inAlnum = false }
      }
      i += Character.charCount(cp)
    }
    if (inTok && stopSet.contains(s.substring(tokStart, n).toLowerCase)) nStop += 1
    InternalRow(nTok, nBpe, nPunct, nWs, len, nStop)
  }
  override protected def withNewChildInternal(c: Expression): TokenStats = copy(child = c)
}

/** MinHash signature over word `shingleK`-shingles of normalized text.
  * Portable mode: slot i uses md5(shingle + "#" + i/2), even slots take hex
  * chars 1-15, odd slots chars 16-30 (two hashes per digest).
  * Output array<long> of length k; null text ⇒ null. */
case class MinHashSig(child: Expression, k: Int, shingleK: Int, portable: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val toks = Hashing.tokenize(v.asInstanceOf[UTF8String].toString.toLowerCase)
    val shingles: Array[String] =
      if (toks.length <= shingleK) Array(toks.mkString(" "))
      else Array.tabulate(toks.length - shingleK + 1)(i =>
        toks.slice(i, i + shingleK).mkString(" "))
    val sig = Array.fill(k)(Long.MaxValue)
    var si = 0
    while (si < shingles.length) {
      val s = shingles(si)
      if (portable) {
        var pair = 0
        while (pair * 2 < k) {
          val (h0, h1) = Hashing.md5_60_pair(
            (s + "#" + pair).getBytes("UTF-8"))
          if (h0 < sig(pair * 2)) sig(pair * 2) = h0
          if (pair * 2 + 1 < k && h1 < sig(pair * 2 + 1)) sig(pair * 2 + 1) = h1
          pair += 1
        }
      } else {
        val bytes = s.getBytes("UTF-8")
        var i = 0
        while (i < k) {
          val h = Hashing.fast64(bytes, i * 0x9E3779B97F4A7C15L + 42L)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      si += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** SimHash of word tokens of normalized text, `bits` wide. Portable mode
  * hashes each token with md5_60; fast mode with splitmix64. */
case class SimHashExpr(child: Expression, bits: Int, portable: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val toks = Hashing.tokenize(v.asInstanceOf[UTF8String].toString.toLowerCase)
    val votes = new Array[Int](bits)
    var ti = 0
    while (ti < toks.length) {
      val h = if (portable) Hashing.md5_60(toks(ti).getBytes("UTF-8"))
              else Hashing.fast64(toks(ti).getBytes("UTF-8"), 42L)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      ti += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
  override protected def withNewChildInternal(c: Expression): SimHashExpr = copy(child = c)
}

/** Word k-shingles of normalized text as array<string> — tight-loop twin of
  * [[graft.text.Text.shingles]] (docs shorter than k words → whole text). */
case class WordShingles(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val toks = Hashing.tokenize(v.asInstanceOf[UTF8String].toString.toLowerCase)
    val sh: Array[String] =
      if (toks.length <= k) Array(toks.mkString(" "))
      else Array.tabulate(toks.length - k + 1)(i => toks.slice(i, i + k).mkString(" "))
    val out = if (distinct) sh.distinct else sh
    new GenericArrayData(out.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** Primitive-loop dot product over two array<float>/array<double> columns,
  * accumulating in double in array order (same as the HOF formulation). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xt = left.dataType.asInstanceOf[ArrayType].elementType
    val yt = right.dataType.asInstanceOf[ArrayType].elementType
    var acc = 0.0
    var i = 0
    if (xt == FloatType && yt == FloatType) {
      while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) {
        val xv = if (xt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (yt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv; i += 1
      }
    }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Column-API entry points (Spark 4: Column wraps a ColumnNode; use the
  * classic ExpressionUtils bridge). */
object F {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  private def e(c: Column) = expression(c)
  def spanChecks(c: Column): Column = column(SpanChecks(e(c)))
  def tokenStats(c: Column, stopwords: Seq[String] = graft.text.Text.Stopwords.values.flatten.toSeq.distinct): Column =
    column(TokenStats(e(c), stopwords))
  def minhashSig(c: Column, k: Int, shingleK: Int, portable: Boolean): Column =
    column(MinHashSig(e(c), k, shingleK, portable))
  def simhash(c: Column, bits: Int, portable: Boolean): Column =
    column(SimHashExpr(e(c), bits, portable))
  def dot(a: Column, b: Column): Column = column(DotProduct(e(a), e(b)))
  def wordShingles(c: Column, k: Int, distinct: Boolean = false): Column =
    column(WordShingles(e(c), k, distinct))
}
