package graft.tools

/** Paste-from-output source for judge-facing registry counts (README /
  * session notes): the numbers come from [[graft.queries.Registry.all]]
  * itself, never hand-typed — hand-written counts have drifted twice
  * when late-round queries landed after the docs were edited.
  *
  * Usage: sbt "runMain graft.tools.RegistryReport"
  */
object RegistryReport {
  def main(args: Array[String]): Unit = {
    val all = graft.queries.Registry.all
    val dup = all.groupBy(_.name).filter(_._2.length > 1).keys.toSeq.sorted
    require(dup.isEmpty, s"duplicate registry names: ${dup.mkString(", ")}")
    val rowsOnly = all.filter(_.oracle.isEmpty).map(_.name).sorted
    println(s"[registry] total queries: ${all.length}")
    println(s"[registry] with DuckDB oracle: ${all.length - rowsOnly.length}")
    println(s"[registry] rows-only (${rowsOnly.length}): ${rowsOnly.mkString(", ")}")
  }
}
