package graft

import org.apache.spark.sql.types._

/** Pins the driver's `/root/testdata` Parquet schemas (FIXTURES.md §2).
  *
  * Round-5 post-mortem: the driver regenerated `events.parquet` with
  * `ts: timestamp[us]` (previously TIMESTAMP(NANOS)), `Tables.events`
  * kept the nanos-as-long shim, and 10 queries died at analysis — while
  * `sbt test` stayed green because every spec synthesizes its own
  * fixtures. This suite is the guard: it reads every real table at
  * sf0.001, asserts the loader-normalized schema consumers depend on,
  * and runs one `Tables.events` consumer end-to-end so the next fixture
  * drift is a red build, not a silent 10-query hole.
  */
class FixtureSchemaSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private def haveFixtures = new java.io.File(sfDir).isDirectory

  private def fields(name: String): Seq[(String, DataType)] = {
    val df =
      if (name == "events") Tables.events(spark, sfDir)
      else Tables.load(spark, sfDir, name)
    df.schema.fields.toSeq.map(f => f.name -> f.dataType)
  }

  // Timestamp fixture columns scan as NTZ (parquet timestamp[us],
  // not UTC-adjusted); consumers tolerate NTZ for orders/lineitem.
  // `events.ts` is the exception: Tables.events normalizes it to
  // TimestampType, which is asserted separately below.
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
  )

  test("every driver table scans with the schema consumers were built against") {
    assume(haveFixtures, s"$sfDir not present in this environment")
    val drifted = Tables.names.flatMap { t =>
      val got = fields(t)
      if (got == expected(t)) None
      else Some(s"$t:\n  expected ${expected(t)}\n  scanned  $got")
    }
    assert(drifted.isEmpty, "fixture schema drift:\n" + drifted.mkString("\n"))
  }

  test("a real Tables.events consumer runs end-to-end on the driver fixture") {
    assume(haveFixtures, s"$sfDir not present in this environment")
    // q15 exercises the normalized ts through a window function; any
    // analysis-time dtype break in Tables.events fails here, in-build.
    val rows = SparkEntry.queries("q15_lag_delta")(spark, sfDir).count()
    assert(rows > 0L)
  }
}
