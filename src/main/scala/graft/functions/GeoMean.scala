package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed-Aggregator UDAF surface: geometric mean, exp(mean(ln x)).
  *
  * The partial state is (Σ ln x as BigDecimal, n): merging is
  * associative AND exact, so map-side combine runs and the result is
  * independent of partition order — a double accumulator would drift
  * by summation order and break cross-engine hash comparison. Each
  * per-row ln is rounded to 18 decimal places before accumulation;
  * an oracle does the same with SUM(CAST(ln(x) AS DECIMAL(38,18))).
  */
/** GeoMean's partial state. Scala BigDecimal keeps the Product-encoder
  * path (DECIMAL(38,18) in the buffer schema). Top-level to avoid a
  * cyclic reference in the Aggregator's own type parameters.
  */
final case class GeoMeanBuf(sumLog: BigDecimal, n: Long)

object GeoMean extends Aggregator[Double, GeoMeanBuf, Double] {

  private type Buf = GeoMeanBuf

  private val Scale = 18

  private def ln18(x: Double): BigDecimal =
    BigDecimal(math.log(x)).setScale(Scale, BigDecimal.RoundingMode.HALF_UP)

  override def zero: Buf = GeoMeanBuf(BigDecimal(0).setScale(Scale), 0L)

  override def reduce(b: Buf, x: Double): Buf =
    // Require finite AND positive: NaN fails `x > 0` (so it's skipped
    // rather than reaching BigDecimal(NaN) → NumberFormatException),
    // and +Infinity is excluded explicitly.
    if (java.lang.Double.isFinite(x) && x > 0.0)
      GeoMeanBuf(b.sumLog + ln18(x), b.n + 1)
    else b

  override def merge(a: Buf, b: Buf): Buf =
    GeoMeanBuf(a.sumLog + b.sumLog, a.n + b.n)

  override def finish(b: Buf): Double =
    if (b.n == 0) 0.0 else math.exp(b.sumLog.toDouble / b.n)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form for DataFrame `agg`. */
  def geoMean(c: Column): Column = udaf(GeoMean).apply(c)
}
