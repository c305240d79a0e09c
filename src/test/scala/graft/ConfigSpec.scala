package graft

import org.scalatest.funsuite.AnyFunSuite

/** Config surface vs the reference contract (utils/constants.py +
  * config.conf.example shape). */
class ConfigSpec extends AnyFunSuite {

  private val sample =
    """# comment
      |[file_paths]
      |input_path = /data/in
      |output_path = /data/out
      |
      |[etl_settings]
      |batch_size = 250
      |error_handling = skip
      |log_level = debug
      |; trailing comment
      |""".stripMargin

  test("parses sections, keys, comments; typed accessors read through") {
    val c = Config.parse(sample)
    assert(c.get("file_paths", "input_path").contains("/data/in"))
    assert(c.etlSettings == Config.EtlSettings(250, "skip", "debug"))
    assert(c.filePaths == Config.FilePaths("/data/in", "/data/out"))
  }

  test("missing keys fall back to reference defaults (100/abort/info)") {
    val c = Config.parse("[etl_settings]\nbatch_size = 7\n")
    assert(c.etlSettings == Config.EtlSettings(7, "abort", "info"))
    assert(Config.parse("").etlSettings == Config.EtlSettings())
  }

  test("last duplicate key wins; invalid error_handling rejected") {
    val c = Config.parse("[s]\nk = a\nk = b\n")
    assert(c.get("s", "k").contains("b"))
    assertThrows[IllegalArgumentException] {
      Config.parse("[etl_settings]\nerror_handling = explode\n").etlSettings
    }
  }
}
