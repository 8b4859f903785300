package graft.tools

import graft.{ExtraSql, SurveySql}

/** Dumps the embedded contract SQL (SurveySql + ExtraSql) as JSON so
  * survey/queries.json can be re-synced whenever the Scala side is amended
  * (tools/sync_queries_json.py consumes this). Keeps the "machine-readable
  * source and embedded contract agree" invariant checkable.
  */
object DumpSql {
  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("survey/sql_dump.json")
    val entries = SurveySql.spark.keys.toSeq.sorted.map { k =>
      s""""${esc(k)}":{"spark_sql":"${esc(SurveySql.spark(k))}","duck_sql":"${esc(SurveySql.duck(k))}"}"""
    } ++ ExtraSql.duck.keys.toSeq.sorted.map { k =>
      s""""${esc(k)}":{"duck_sql":"${esc(ExtraSql.duck(k))}"}"""
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out),
      entries.mkString("{", ",", "}").getBytes("UTF-8"))
    println(s"wrote $out")
  }
}
