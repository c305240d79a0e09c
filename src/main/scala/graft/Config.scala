package graft

/** INI-style configuration surface mirroring the reference's
  * `utils/constants.py:1-42` + `config/config.conf.example` contract:
  * `[section]` headers, `key = value` pairs, `#`/`;` comments. The
  * reference wires `etl_settings.batch_size` / `error_handling` /
  * `log_level` and `file_paths.input_path` / `output_path` into its
  * extractor; credentials sections are parsed generically — their one
  * typed consumer is [[graft.ingest.RedditHttp.fromConfig]] (round 11:
  * the live client), which reads the reference's `[api_keys]` keys via
  * [[GraftConfig.get]].
  *
  * Pure function of the file text: no environment probing, no session
  * mutation.
  */
object Config {

  final case class EtlSettings(batchSize: Int = 100,
                               errorHandling: String = "abort",
                               logLevel: String = "info") {
    require(errorHandling == "abort" || errorHandling == "skip",
      s"error_handling must be abort|skip, got $errorHandling")
  }

  final case class FilePaths(inputPath: String = "data/input",
                             outputPath: String = "data/output")

  final case class GraftConfig(sections: Map[String, Map[String, String]]) {
    def get(section: String, key: String): Option[String] =
      sections.get(section).flatMap(_.get(key))

    def etlSettings: EtlSettings = {
      val d = EtlSettings()
      EtlSettings(
        batchSize = get("etl_settings", "batch_size").map(_.toInt)
          .getOrElse(d.batchSize),
        errorHandling = get("etl_settings", "error_handling")
          .getOrElse(d.errorHandling),
        logLevel = get("etl_settings", "log_level").getOrElse(d.logLevel))
    }

    def filePaths: FilePaths = {
      val d = FilePaths()
      FilePaths(
        inputPath = get("file_paths", "input_path").getOrElse(d.inputPath),
        outputPath = get("file_paths", "output_path").getOrElse(d.outputPath))
    }
  }

  /** Parse INI text: last duplicate key wins (configparser semantics);
    * keys before any section header land in section "". */
  def parse(text: String): GraftConfig = {
    var section = ""
    var acc = Map.empty[String, Map[String, String]]
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim
        } else line.indexOf('=') match {
          case -1 => () // bare line: configparser would error; we skip
          case i =>
            val k = line.substring(0, i).trim
            val v = line.substring(i + 1).trim
            acc = acc.updated(section,
              acc.getOrElse(section, Map.empty).updated(k, v))
        }
      }
    }
    GraftConfig(acc)
  }

  def load(path: String): GraftConfig =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
}
