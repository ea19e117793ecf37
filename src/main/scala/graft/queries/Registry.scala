package graft.queries

/** Master query registry — everything the driver verifies and benches. */
object Registry {
  def all: Seq[GQuery] =
    Relational.all ++ Windows.all ++ SetOpsScalar.all ++
      DedupQueries.all ++ TextQueries.all ++ SimilarityQueries.all ++
      MultimodalQueries.all ++ UdafQueries.all ++ Relational2.all ++
      SamplingQueries.all ++ SerdeQueries.all ++ ProfilingQueries.all

  def byName: Map[String, GQuery] = all.map(q => q.name -> q).toMap

  def headline: Seq[GQuery] = all.filter(_.headline)
}
