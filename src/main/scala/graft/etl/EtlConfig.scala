package graft.etl

import org.apache.spark.sql.SparkSession

/** Config-file layer for the runnable mains — the analog of the
  * reference's `configparser` over `etl_config.cfg`
  * (`/root/reference/Capstone/scripts/etl.py:633-652`,
  * `Capstone/config/etl_config.cfg:43-64`): INI sections carrying the
  * input-file list, output paths, and the DQ table/column map.
  *
  * Self-contained parser (no extra dependencies): `[SECTION]` headers,
  * `key = value` pairs, `#`/`;` comment lines. Values may be wrapped in
  * single quotes like the reference's cfg; lists are `["a", "b"]` and the
  * DQ column map is `{"table": ["col", ...], ...}` — the same literal
  * forms the reference stores.
  */
final case class EtlConfig(sections: Map[String, Map[String, String]]) {

  def get(section: String, key: String): Option[String] =
    sections.getOrElse(section.toUpperCase, Map.empty).get(key)

  def apply(section: String, key: String): String =
    get(section, key).getOrElse(
      throw new IllegalArgumentException(s"missing config [$section] $key"))

  /** `["a", "b"]` (optionally single-quote-wrapped) → Seq("a", "b"). */
  def list(section: String, key: String): Seq[String] =
    EtlConfig.parseList(apply(section, key))

  /** `{"t": ["c1", "c2"], ...}` → Map(t -> Seq(c1, c2)). */
  def tableMap(section: String, key: String): Map[String, Seq[String]] =
    EtlConfig.parseTableMap(apply(section, key))

  // --- path resolution per the reference's base_dir/data_dir layout ---
  def baseDir: String = apply("PATHS", "base_dir")
  private def sub(key: String, default: String): String =
    get("PATHS", key).map(d => s"$baseDir/$d").getOrElse(s"$baseDir/$default")
  def dataDir: String = sub("data_dir", "data")
  def dictDir: String = sub("dict_dir", "data")
  def outputDir: String = sub("output_dir", "output")
  def logDir: String = sub("log_dir", "log")

  def inputFiles: Seq[String] = list("PATHS", "input_files").map(f => s"$dataDir/$f")
  def airportsFile: String = s"$dataDir/${apply("PATHS", "airports_file")}"
  def demographicsFile: String = s"$dataDir/${apply("PATHS", "us_demographics_file")}"
  def dictionaryFile: String = s"$dictDir/${apply("PATHS", "dictionary_file")}"

  /** DQ specs: table → key columns (empty Seq = row-count check only). */
  def dqSpecs: Seq[(String, Seq[String])] = {
    val cols = get("DQ", "table_col").map(EtlConfig.parseTableMap).getOrElse(Map.empty)
    list("DQ", "tables").map(t => t -> cols.getOrElse(t, Nil))
  }
}

object EtlConfig {

  def parse(content: String): EtlConfig = {
    var section = "DEFAULT"
    val acc = scala.collection.mutable.Map.empty[String, Map[String, String]]
    content.linesIterator.map(_.trim).foreach {
      case l if l.isEmpty || l.startsWith("#") || l.startsWith(";") => ()
      case l if l.startsWith("[") && l.endsWith("]") =>
        section = l.substring(1, l.length - 1).trim.toUpperCase
      case l if l.contains("=") =>
        val Array(k, v) = l.split("=", 2)
        acc(section) = acc.getOrElse(section, Map.empty) +
          (k.trim -> unquote(v.trim))
      case _ => () // bare continuation lines are not part of the cfg dialect
    }
    EtlConfig(acc.toMap)
  }

  /** Read a config file through Hadoop FS, so file:// and remote-store
    * URIs resolve the same way the data paths do.
    */
  def load(spark: SparkSession, path: String): EtlConfig =
    parse(HadoopIo.readUtf8(spark, path))

  private def unquote(v: String): String =
    if (v.length >= 2 && ((v.head == '\'' && v.last == '\'') ||
        (v.head == '"' && v.last == '"'))) v.substring(1, v.length - 1)
    else v

  private[etl] def parseList(raw: String): Seq[String] = {
    val body = unquote(raw).trim
    require(body.startsWith("[") && body.endsWith("]"),
      s"expected a [\"...\"] list, got: $raw")
    body.substring(1, body.length - 1).split(",")
      .map(e => unquote(e.trim)).filter(_.nonEmpty).toSeq
  }

  private val entryRe = """"([^"]+)"\s*:\s*\[([^\]]*)\]""".r

  private[etl] def parseTableMap(raw: String): Map[String, Seq[String]] = {
    val body = unquote(raw).trim
    require(body.startsWith("{") && body.endsWith("}"),
      s"""expected a {"t": [...]} map, got: $raw""")
    entryRe.findAllMatchIn(body).map { m =>
      m.group(1) -> m.group(2).split(",").map(e => unquote(e.trim))
        .filter(_.nonEmpty).toSeq
    }.toMap
  }
}
