package graft

import java.nio.file.{Files, Paths}

/** Dump `SparkEntry.oracleSql` as JSON without spinning up Spark or
  * running queries — the fast inner loop for the dual-dialect oracle
  * work (DuckDB old-vs-new differential runs straight off this file). */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(args(0)), json)
    ()
  }
}
