package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregator (SURVEY.md §2.8 decision table, last row):
  * ordered first-seen distinct pairs WITH collected payloads, in one
  * aggregation pass.
  *
  * The window formulation (Enrich.rankedPairs) needs a groupBy plus a
  * window — two shuffles of the full pair set. This Aggregator keeps a
  * (pair → (minIdx, payloads)) map per partition and merges maps, so
  * per-branch ordered-distinct happens with ONE shuffle and map-side
  * partial aggregation — the shape that wins when branches are many
  * and pairs-per-branch few (the fleet case). Semantics are identical
  * (spec-verified against rankedPairs): pair order = first row index
  * seen, payload order = row index, cap at `keep`.
  */
object FirstSeenPairsAgg {

  final case class PairIn(primary: String, secondary: String,
      rowIdx: Long, sub: String)
  final case class PairAcc(minIdx: Long, subs: List[(Long, String)])
  final case class PairOut(primary: String, secondary: String,
      lineId: String, subscribers: Seq[String])

  private val Sep = "\u0000"

  /** key = primary + NUL + secondary (string key keeps the buffer
    * encoder simple; NUL cannot occur in sheet text after F6). */
  private def key(p: String, s: String): String =
    Option(p).getOrElse("") + Sep + Option(s).getOrElse("")

  final class FirstSeenPairs(keep: Int)
    extends Aggregator[PairIn, Map[String, PairAcc], Seq[PairOut]] {

    override def zero: Map[String, PairAcc] = Map.empty

    override def reduce(b: Map[String, PairAcc], in: PairIn): Map[String, PairAcc] = {
      val k = key(in.primary, in.secondary)
      val acc = b.get(k) match {
        case Some(PairAcc(m, subs)) =>
          PairAcc(math.min(m, in.rowIdx), (in.rowIdx, in.sub) :: subs)
        case None => PairAcc(in.rowIdx, List((in.rowIdx, in.sub)))
      }
      b.updated(k, acc)
    }

    override def merge(a: Map[String, PairAcc], b: Map[String, PairAcc]): Map[String, PairAcc] =
      b.foldLeft(a) { case (acc, (k, v)) =>
        acc.get(k) match {
          case Some(PairAcc(m, subs)) =>
            acc.updated(k, PairAcc(math.min(m, v.minIdx), v.subs ::: subs))
          case None => acc.updated(k, v)
        }
      }

    override def finish(b: Map[String, PairAcc]): Seq[PairOut] =
      b.toSeq.sortBy(_._2.minIdx).take(keep).map { case (k, acc) =>
        val parts = k.split(Sep, -1)
        val subs = acc.subs.sortBy(_._1).map(_._2)
        PairOut(parts(0), parts(1), subs.headOption.orNull, subs)
      }

    override def bufferEncoder: Encoder[Map[String, PairAcc]] =
      ExpressionEncoder[Map[String, PairAcc]]()
    override def outputEncoder: Encoder[Seq[PairOut]] =
      ExpressionEncoder[Seq[PairOut]]()
  }

  def apply(keep: Int = 2): FirstSeenPairs = new FirstSeenPairs(keep)
}
