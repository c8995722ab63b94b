package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule: rewrite a naive banded-range join
  *
  * {{{ a JOIN b ON a.k = b.k AND abs(a.t - b.t) <= W }}}
  *
  * into the scale-safe banded equi-join (cf. [[graft.ops.RangeJoin]]):
  * bucket `t` into width-W bins on both sides, replicate the right side
  * into its ±1 neighbor bins, and join on `(k, bin)` as well. Catalyst
  * alone keeps only `k` as the equi-key and evaluates the range
  * predicate per same-key pair — O(n²) on a hot key; after the rewrite
  * the per-key work is O(n · density) and the physical plan is a plain
  * shuffled join. Any pair within W spans at most adjacent bins, and
  * each pair meets exactly one probed bin (bins are disjoint), so the
  * rewrite is result-identical — the original predicates are kept
  * verbatim in the new join condition.
  *
  * Deployed via `spark.sql.extensions=graft.GraftExtensions`
  * (`injectOptimizerRule`); matches only the exact two-conjunct shape
  * above (integral time columns, positive literal window) and is
  * self-guarding: the rewritten join has three conjuncts, so the rule
  * never re-fires on its own output.
  */
object BandedRangeJoin extends Rule[LogicalPlan] {

  private val BinCol = "__graft_bin__"

  private final case class Banded(
      leftTime: Expression, rightTime: Expression, window: Long,
      eq: Expression, range: Expression)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, Inner, Some(And(c1, c2)), _) =>
      extract(c1, c2, j).orElse(extract(c2, c1, j)) match {
        case Some(m) => rewrite(j, m)
        case None => j
      }
  }

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def litWindow(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) if v > 0 => Some(v)
    case Literal(v: Int, IntegerType) if v > 0 => Some(v.toLong)
    case _ => None
  }

  /** Try to read (equality, range) out of the two conjuncts. */
  private def extract(eqc: Expression, rc: Expression, j: Join): Option[Banded] = {
    // which side of the join an expression evaluates on: Some(true) =
    // left only, Some(false) = right only
    def side(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(j.left.outputSet)) Some(true)
      else if (e.references.subsetOf(j.right.outputSet)) Some(false)
      else None
    eqc match {
      case eq @ EqualTo(k1, k2) =>
        (side(k1), side(k2)) match {
          case (Some(s1), Some(s2)) if s1 != s2 =>
            rc match {
              case range @ LessThanOrEqual(Abs(Subtract(t1, t2, _), _), lw) =>
                for {
                  w <- litWindow(lw)
                  st1 <- side(t1)
                  st2 <- side(t2)
                  if st1 != st2 && isIntegral(t1) && isIntegral(t2)
                } yield {
                  val (lt, rt) = if (st1) (t1, t2) else (t2, t1)
                  Banded(lt, rt, w, eq, range)
                }
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }
  }

  /** Width-`w` bin of integral `t`, exact for any sign: (t - pmod(t,w))
    * is an exact multiple of w, so the integral division is a true
    * floor — no float path, no ulp misbinning. */
  private def bin(t: Expression, w: Long): Expression = {
    val tl = if (t.dataType == LongType) t else Cast(t, LongType)
    val wl = Literal(w, LongType)
    IntegralDivide(Subtract(tl, Pmod(tl, wl)), wl)
  }

  private def rewrite(j: Join, m: Banded): LogicalPlan = {
    val lAlias = Alias(bin(m.leftTime, m.window), BinCol)()
    val newLeft = Project(j.left.output :+ lAlias, j.left)

    val rBin = bin(m.rightTime, m.window)
    val one = Literal(1L, LongType)
    val probes = Explode(CreateArray(Seq(Subtract(rBin, one), rBin, Add(rBin, one))))
    val rAttr = AttributeReference(BinCol, LongType, nullable = true)()
    val newRight = Generate(probes, Nil, outer = false, None, Seq(rAttr), j.right)

    val cond = And(And(m.eq, EqualTo(lAlias.toAttribute, rAttr)), m.range)
    Project(j.output, Join(newLeft, newRight, Inner, Some(cond), j.hint))
  }
}
