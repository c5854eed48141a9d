package graft.io

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import graft.clean.CleanConfig
import graft.core.RuleSpec._
import graft.rules.BoundRule
import scala.jdk.CollectionConverters._

/**
 * Config-file ingestion: parses the reference's `config/default.yaml` shape
 * (`/root/reference/config/default.yaml:1-113`,
 * `/root/reference/src/engine/config.py:30-118`,
 * `config_loader.py:179-210`) into a [[CleanConfig]] plus bound validation
 * rules, so the engine can be driven entirely from a config file. YAML and
 * JSON are both accepted (Jackson YAMLFactory parses either).
 */
object ConfigLoader {

  case class LoadedConfig(
      clean: CleanConfig,
      rules: Seq[BoundRule],
      outputFormat: String,
      maxFileSizeMb: Double)

  private val mapper = new ObjectMapper(new YAMLFactory())

  def load(path: String): LoadedConfig =
    parse(mapper.readTree(new java.io.File(path)))

  def loadString(yaml: String): LoadedConfig =
    parse(mapper.readTree(yaml))

  private def str(n: JsonNode, field: String, dflt: String): String = {
    val v = n.path(field)
    if (v.isMissingNode || v.isNull) dflt else v.asText(dflt)
  }
  private def dbl(n: JsonNode, field: String, dflt: Double): Double = {
    val v = n.path(field); if (v.isNumber) v.asDouble else dflt
  }
  private def bool(n: JsonNode, field: String, dflt: Boolean): Boolean = {
    val v = n.path(field); if (v.isBoolean) v.asBoolean else dflt
  }
  private def strs(n: JsonNode, field: String): Seq[String] = {
    val v = n.path(field)
    if (v.isArray) v.elements().asScala.map(_.asText()).toSeq else Nil
  }

  def parse(root: JsonNode): LoadedConfig = {
    val schema = root.path("schema")
    val missing = root.path("missing_values")
    val outliers = root.path("outliers")
    val dups = root.path("duplicates")
    val text = root.path("text_cleaning")
    val validation = root.path("validation")

    val dataTypes: Map[String, String] = {
      val v = schema.path("data_types")
      if (v.isObject)
        v.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      else Map.empty
    }
    val allowed: Map[String, Seq[String]] = {
      val v = text.path("allowed_values")
      if (v.isObject)
        v.properties().asScala.map { e =>
          e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSeq
        }.toMap
      else Map.empty
    }
    val stageEnabled: Map[String, Boolean] = {
      val v = root.path("stages")
      if (v.isObject)
        v.properties().asScala.map(e =>
          e.getKey -> bool(e.getValue, "enabled", dflt = true)).toMap
      else Map.empty
    }

    // keep: "first" | "last" | false — `false` means remove ALL duplicate
    // rows; any truthy keep collapses to hash-distinct (no row order)
    val removeFull = bool(dups, "remove_full_row_duplicates", dflt = true)

    val clean = CleanConfig(
      requiredColumns = strs(schema, "required_columns"),
      expectedTypes = dataTypes,
      caseMode = Option(str(text, "normalize_case", null)).getOrElse("none") match {
        case "lower" => "lower"; case "upper" => "upper"; case "title" => "title"
        case _ => "none"
      },
      removeDuplicates = removeFull,
      duplicateKeys = strs(dups, "primary_key"),
      maxMissingRowPct = dbl(missing.path("thresholds"), "row_threshold",
        dbl(validation, "max_missing_row_percentage", 50.0)),
      outlierMethod = str(outliers, "method", "zscore"),
      outlierStrategy = str(outliers, "strategy", "cap"),
      mandatoryColumns = strs(missing, "mandatory_columns"),
      stripWhitespace = bool(text, "strip_whitespace", dflt = true),
      removeSpecialChars = bool(text, "remove_special_characters", dflt = false),
      allowedValues = allowed,
      stageEnabled = stageEnabled)

    // declarative rule bindings implied by the config: mandatory columns are
    // Required; allowed_values become enum masks (P15)
    val rules =
      clean.mandatoryColumns.map(c => BoundRule(Required(c))) ++
      allowed.toSeq.sortBy(_._1).map { case (c, vs) =>
        BoundRule(AllowedValues(c, vs), Some(s"$c not in allowed values")) }

    LoadedConfig(clean, rules,
      outputFormat = str(root, "output_format", "csv"),
      maxFileSizeMb = dbl(root, "max_file_size_mb", 100.0))
  }
}
