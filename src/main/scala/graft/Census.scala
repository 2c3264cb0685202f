package graft

/** Mechanical registry census — prints per-group query counts straight
  * from the `QueryDef` lists, so the documented total can no longer
  * drift from the code (README's count was flagged stale three times
  * in five rounds when it was hand-maintained). The round-close
  * checklist runs `sbt 'runMain graft.Census'` and pastes the output
  * into README.md's registry row.
  */
object Census {
  def main(args: Array[String]): Unit = {
    val groups = Seq(
      "StoreQueries" -> graft.queries.StoreQueries.defs,
      "Relational" -> graft.queries.Relational.defs,
      "EventQueries" -> graft.queries.EventQueries.defs,
      "NorthStar" -> graft.queries.NorthStar.defs)
    groups.foreach { case (g, ds) =>
      println(s"$g: ${ds.size} (${ds.head.name} .. ${ds.last.name})")
    }
    val all = groups.flatMap { case (_, ds) => ds }
    println(s"total: ${all.size} graded queries, " +
      s"${all.count(_.oracle.nonEmpty)} with DuckDB oracle SQL")
  }
}
