package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAFs via `Aggregator` (SURVEY.md §2.2 UDF/UDAF row): the
  * engine's extension point for aggregation logic Spark lacks. Buffers
  * are tiny case-class/tuple state with proper merge — partial (map-side)
  * aggregation works exactly like built-in aggregates, which is what
  * makes a custom aggregate survive 100 TB (no per-group row shipping).
  */
object Udafs {

  /** Geometric mean = exp(mean(ln x)) over positive doubles. */
  val geomeanAgg: Aggregator[Double, (Double, Long), Double] =
    new Aggregator[Double, (Double, Long), Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), x: Double): (Double, Long) =
        if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
      def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
        (a._1 + b._1, a._2 + b._2)
      def finish(b: (Double, Long)): Double =
        if (b._2 == 0) 0.0 else math.exp(b._1 / b._2)
      def bufferEncoder: Encoder[(Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Column form: `geomean(col)`. */
  def geomean(c: Column): Column = udaf(geomeanAgg, Encoders.scalaDouble)(c)
}
