package graft.tools

/**
 * Spark-free ALU/L1-resident burn: N threads each run a fixed count of
 * xxhash-style 64-bit mixing rounds over a register-resident state — no
 * DRAM traffic, no shared data. Per-thread throughput at width 8 vs 32
 * isolates the CORE-side machine ceiling (all-core turbo / scheduler
 * effects) that the DRAM-streaming burn in ScalingBench cannot see: the
 * streaming burn is latency/bandwidth-bound and insensitive to core
 * frequency, so it can report a ~1.0 machine ceiling while every core's
 * ALU throughput drops at full width. Companion evidence for the 8→32
 * engine-vs-ceiling attribution (VERDICT r5 item 1).
 */
object AluBurn {
  private def mix(h0: Long, rounds: Long): Long = {
    var h = h0; var i = 0L
    while (i < rounds) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33; h += i
      i += 1
    }
    h
  }

  def burn(threads: Int, roundsPerThread: Long): Double = {
    val sink = new java.util.concurrent.atomic.AtomicLong
    val start = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(threads)
    (0 until threads).foreach { t =>
      new Thread(() => {
        start.await()
        sink.addAndGet(mix(0x9E3779B97F4A7C15L + t, roundsPerThread))
        done.countDown()
      }).start()
    }
    val t0 = System.nanoTime(); start.countDown(); done.await()
    val sec = (System.nanoTime() - t0) / 1e9
    threads * roundsPerThread / sec / 1e6 // aggregate Mrounds/s
  }

  def main(args: Array[String]): Unit = {
    val rounds = sys.env.getOrElse("ROUNDS", "2000000000").toLong
    burn(1, rounds / 4) // JIT warmup
    Seq(1, 8, 32).foreach { w =>
      val best = (1 to 3).map(_ => burn(w, rounds)).max
      println(f"threads=$w%2d aggregate=${best}%.0f Mrounds/s per-thread=${best / w}%.1f")
    }
    val e8 = (1 to 3).map(_ => burn(8, rounds)).max
    val e32 = (1 to 3).map(_ => burn(32, rounds)).max
    println(f"alu 8->32 scaling efficiency: ${e32 / (4 * e8)}%.3f")
  }
}
