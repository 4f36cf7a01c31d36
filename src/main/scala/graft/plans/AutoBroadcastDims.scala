package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer `Rule[LogicalPlan]`: auto-broadcast REGISTERED bounded
  * dimension tables.
  *
  * Catalyst's own broadcast decision is driven by size statistics
  * (`spark.sql.autoBroadcastJoinThreshold`). At warehouse scale that
  * heuristic misses a class of tables graft KNOWS are broadcastable:
  * bounded dimensions whose cardinality is fixed by the schema contract
  * (TPC-H `region` = 5 rows, `nation` = 25 at EVERY scale factor) even
  * when file-level stats are absent, stale, or inflated past the
  * threshold. This rule encodes that catalog knowledge: any join side
  * that is a (projected/filtered) scan of a registered dimension gets a
  * BROADCAST hint, which `JoinSelection` then honours regardless of
  * stats.
  *
  * Safety: never overrides an existing user hint on that side, and
  * only hints sides the join type can legally build (no broadcast hint
  * on e.g. the preserved side of an outer join). Idempotent — a second
  * pass sees the hint filled and leaves the plan untouched, so it is
  * fixed-point-safe in the operator-optimization batch.
  *
  * Registered via [[graft.GraftExtensions]]
  * (`ext.injectOptimizerRule`), completing graft's extension-point
  * tour: expressions ✓, aggregates ✓, analyzer function registration ✓,
  * optimizer rule ✓ (this), strategy + physical operator ✓
  * (AsOfJoinNative). */
case class AutoBroadcastDims(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The scanned table's name, looking through the operators that
    * pushdown/pruning leave stacked on a leaf scan. */
  private def dimName(p: LogicalPlan): Option[String] = p match {
    case Project(_, c) => dimName(c)
    case Filter(_, c) => dimName(c)
    case SubqueryAlias(_, c) => dimName(c)
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption
          .map(_.getName.replaceAll("\\.parquet$", ""))
      case _ => None
    }
    case _ => None
  }

  /** Registered-name match alone is not enough to force a broadcast:
    * the registry keys on the path stem, so a LARGE table that merely
    * shares a directory name with a bounded dim would be force-built
    * into every executor (and the driver) — an OOM, not a plan
    * improvement. Guard on the scan's own size statistic and fail open
    * to Catalyst's stats-based planning when the relation is bigger
    * than the cap (or its size is unknown, i.e. defaultSizeInBytes). */
  private def fitsCap(p: LogicalPlan): Boolean =
    p.stats.sizeInBytes <= AutoBroadcastDims.maxBroadcastBytes

  private def isDim(p: LogicalPlan): Boolean =
    dimName(p).exists(AutoBroadcastDims.registered.contains) && fitsCap(p)

  private def canBuildLeft(jt: JoinType): Boolean = jt match {
    case _: InnerLike | RightOuter => true
    case _ => false
  }

  private def canBuildRight(jt: JoinType): Boolean = jt match {
    case _: InnerLike | LeftOuter | LeftSemi | LeftAnti => true
    case _: ExistenceJoin => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j: Join =>
      val lh =
        if (j.hint.leftHint.isEmpty && canBuildLeft(j.joinType) && isDim(j.left))
          Some(HintInfo(strategy = Some(BROADCAST)))
        else j.hint.leftHint
      val rh =
        if (j.hint.rightHint.isEmpty && canBuildRight(j.joinType) && isDim(j.right))
          Some(HintInfo(strategy = Some(BROADCAST)))
        else j.hint.rightHint
      if ((lh eq j.hint.leftHint) && (rh eq j.hint.rightHint)) j
      else j.copy(hint = JoinHint(lh, rh))
  }
}

object AutoBroadcastDims {
  /** Bounded-dimension registry: table stems whose row count is capped
    * by the data contract, independent of scale factor. */
  @volatile private var dims: Set[String] = Set("region", "nation")

  def registered: Set[String] = dims

  /** Declare additional bounded dimensions (e.g. a tenant catalog). */
  def register(names: String*): Unit = synchronized { dims ++= names }

  /** Hard ceiling on a force-broadcast dim's scan-size statistic; a
    * registered name whose files exceed this falls back to stats-based
    * planning. Generous vs any schema-bounded dimension, small vs
    * executor memory. */
  @volatile var maxBroadcastBytes: Long = 256L << 20
}
