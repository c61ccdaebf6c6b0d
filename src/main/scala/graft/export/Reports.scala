package graft.export

/** Quality/cleaning report rendering (reference: the agent exports a quality
  * report and a cleaning report as JSON next to the cleaned parquet,
  * tools/report.py). Plain case classes + a dependency-free JSON renderer —
  * reports are driver-side metadata, never data.
  */
object Reports {

  final case class ColumnFinding(column: String, category: String,
                                 severity: String, detail: String, count: Long)
  final case class QualityReport(table: String, totalRows: Long,
                                 findings: Seq[ColumnFinding])
  final case class CleaningStep(step: String, column: String, cellsChanged: Long)
  final case class CleaningReport(table: String, rowsIn: Long, rowsOut: Long,
                                  steps: Seq[CleaningStep])

  def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def render(r: QualityReport): String = {
    val fs = r.findings.map { f =>
      s"""{"column":"${esc(f.column)}","category":"${esc(f.category)}",""" +
        s""""severity":"${esc(f.severity)}","detail":"${esc(f.detail)}","count":${f.count}}"""
    }.mkString("[", ",", "]")
    s"""{"table":"${esc(r.table)}","total_rows":${r.totalRows},"findings":$fs}"""
  }

  def render(r: CleaningReport): String = {
    val ss = r.steps.map { s =>
      s"""{"step":"${esc(s.step)}","column":"${esc(s.column)}","cells_changed":${s.cellsChanged}}"""
    }.mkString("[", ",", "]")
    s"""{"table":"${esc(r.table)}","rows_in":${r.rowsIn},"rows_out":${r.rowsOut},"steps":$ss}"""
  }

  def write(path: String, json: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path), json.getBytes("UTF-8"))
}
