package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregate (SURVEY §2.10's UDAF superset): volume-weighted
  * average price, the canonical market-analytics custom aggregate.
  *
  * Exactness: prices are ≤2-decimal, so the buffer accumulates price·weight
  * in integer CENTS — commutative, associative, order-insensitive, and
  * overflow-safe (≤2^63 at any realistic scale). The final value
  * (cents/100)/Σw is bit-identical to the DuckDB oracle's
  * decimal-accumulated form. This is the same decimal-accumulation rule as
  * [[Num.dsum]], expressed through the Aggregator API.
  */
object VwapAggregator {
  case class In(price: Double, weight: Long)
  case class Buf(cents: Long, weight: Long)

  val vwap: Aggregator[In, Buf, Double] = new Aggregator[In, Buf, Double] {
    def zero: Buf = Buf(0L, 0L)
    def reduce(b: Buf, in: In): Buf =
      Buf(b.cents + math.round(in.price * 100) * in.weight, b.weight + in.weight)
    def merge(a: Buf, b: Buf): Buf = Buf(a.cents + b.cents, a.weight + b.weight)
    def finish(b: Buf): Double =
      if (b.weight == 0L) 0.0 else (b.cents.toDouble / 100.0) / b.weight
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Untyped column form: `vwapUdaf(price, weight)`. */
  def vwapColumn(price: Column, weight: Column): Column =
    udaf(vwap, Encoders.product[In]).apply(price, weight)
}
