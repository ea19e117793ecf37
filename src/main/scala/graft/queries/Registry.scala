package graft.queries

/** Master query registry — everything the driver verifies and benches. */
object Registry {
  /** Family name (= defining file under `queries/`) → its queries.
    * Kept as data so tooling (RegistryReport's generated SURVEY
    * appendix) can cite where every query lives without hand-edited
    * inventory rows drifting from the registry. */
  def families: Seq[(String, Seq[GQuery])] = Seq(
    "Relational" -> Relational.all,
    "Windows" -> Windows.all,
    "SetOpsScalar" -> SetOpsScalar.all,
    "DedupQueries" -> DedupQueries.all,
    "TextQueries" -> TextQueries.all,
    "SimilarityQueries" -> SimilarityQueries.all,
    "MultimodalQueries" -> MultimodalQueries.all,
    "UdafQueries" -> UdafQueries.all,
    "Relational2" -> Relational2.all,
    "SamplingQueries" -> SamplingQueries.all,
    "SerdeQueries" -> SerdeQueries.all,
    "ProfilingQueries" -> ProfilingQueries.all)

  def all: Seq[GQuery] = families.flatMap(_._2)

  def byName: Map[String, GQuery] = all.map(q => q.name -> q).toMap

  def headline: Seq[GQuery] = all.filter(_.headline)
}
