package graft.dash

/**
 * Dashboard / chart specs with JSON rendering
 * (raise_/analytics/dashboard.py: 12 chart types :19-33, 7 parameter
 * types :36-46, grid layout, render json/html, publish :361-593).
 * Spec-building and rendering are pure Scala; chart data comes from the
 * analysis operators at render time.
 */
object ChartType extends Enumeration {
  val Line, Bar, Area, Scatter, Pie, Histogram, Heatmap, Table, Stat,
      Gauge, Funnel, Box = Value
}

object ParamType extends Enumeration {
  val Text, Number, Date, DateRange, Select, MultiSelect, Bool = Value
}

final case class Parameter(
    name: String, ptype: ParamType.Value,
    default: Option[String] = None, options: Seq[String] = Nil)

final case class Chart(
    title: String,
    chartType: ChartType.Value,
    queryName: String, // key into SparkEntry.queries / analysis registry
    x: Option[String] = None,
    y: Seq[String] = Nil,
    w: Int = 6, h: Int = 4, gridX: Int = 0, gridY: Int = 0)

final case class Dashboard(
    name: String,
    title: String,
    charts: Seq[Chart] = Nil,
    parameters: Seq[Parameter] = Nil,
    published: Boolean = false) {

  def withChart(c: Chart): Dashboard = copy(charts = charts :+ c)
  def publish: Dashboard = copy(published = true)

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def toJson: String = {
    val chartsJson = charts.map { c =>
      s"""{"title":${q(c.title)},"type":${q(c.chartType.toString.toLowerCase)},""" +
        s""""query":${q(c.queryName)},"x":${c.x.fold("null")(q)},""" +
        s""""y":[${c.y.map(q).mkString(",")}],""" +
        s""""layout":{"w":${c.w},"h":${c.h},"x":${c.gridX},"y":${c.gridY}}}"""
    }.mkString("[", ",", "]")
    val paramsJson = parameters.map { p =>
      s"""{"name":${q(p.name)},"type":${q(p.ptype.toString.toLowerCase)},""" +
        s""""default":${p.default.fold("null")(q)},""" +
        s""""options":[${p.options.map(q).mkString(",")}]}"""
    }.mkString("[", ",", "]")
    s"""{"name":${q(name)},"title":${q(title)},"published":$published,""" +
      s""""charts":$chartsJson,"parameters":$paramsJson}"""
  }

  /**
   * Executes one DataFrame per chart and materializes a bounded row set
   * for rendering — chart data comes straight from analysis operators
   * (the collect is bounded by `maxRows` per chart; dashboards render
   * aggregated frames, never raw fact rows).
   */
  def materialize(frames: Map[String, org.apache.spark.sql.DataFrame],
      maxRows: Int = 1000): Map[String, Seq[Map[String, Any]]] =
    charts.flatMap { c =>
      frames.get(c.queryName).map { df =>
        val cols = df.columns
        val rows = df.limit(maxRows).collect().toSeq.map(r =>
          cols.zipWithIndex.map { case (cn, i) =>
            cn -> (r.get(i): Any) }.toMap)
        c.queryName -> rows
      }
    }.toMap

  /** Render HTML with live chart data (see [[materialize]]). */
  def renderHtml(frames: Map[String, org.apache.spark.sql.DataFrame],
      maxRows: Int = 1000): String =
    toHtml(materialize(frames, maxRows))

  /** Render HTML by running an [[graft.analysis.Analysis]] spec per
    * chart against `df` through the AnalysisPlanner. */
  def renderAnalyses(df: org.apache.spark.sql.DataFrame,
      analyses: Map[String, graft.analysis.Analysis],
      maxRows: Int = 1000): String =
    renderHtml(analyses.map { case (k, a) =>
      k -> graft.analysis.AnalysisPlanner.plan(df, a)
    }, maxRows)

  /** Minimal static HTML render (tables only — no JS deps offline). */
  def toHtml(data: Map[String, Seq[Map[String, Any]]] = Map.empty): String = {
    val body = charts.map { c =>
      val rows = data.getOrElse(c.queryName, Nil)
      val table =
        if (rows.isEmpty) "<p>(no data)</p>"
        else {
          val cols = rows.head.keys.toSeq
          val header = cols.map(h => s"<th>$h</th>").mkString
          val trs = rows.map(r =>
            "<tr>" + cols.map(k => s"<td>${r(k)}</td>").mkString + "</tr>")
            .mkString
          s"<table><tr>$header</tr>$trs</table>"
        }
      s"<section><h2>${c.title}</h2>$table</section>"
    }.mkString
    s"<!doctype html><html><head><title>$title</title></head><body><h1>$title</h1>$body</body></html>"
  }
}
