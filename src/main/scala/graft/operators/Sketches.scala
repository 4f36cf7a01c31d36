package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import graft.expressions.{ThetaEstimate, ThetaIntersect, ThetaSketchAgg, ThetaUnion}

/** Mergeable sketch aggregates (SURVEY §7(f)). Theta/KMV sketches
  * complement the HLL distinct counts of q30 with SET OPERATIONS:
  * union/intersection/difference cardinality estimates across
  * pre-aggregated sketches — the only tractable shape for
  * "overlap between training sources" questions at 100 TB. */
object Sketches {

  /** Aggregate a column into a KMV theta sketch (binary blob; fixed
    * k·8 bytes; partial-aggregates merge map-side). */
  def thetaSketch(c: Column, k: Int = 1024): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Distinct-count estimate of a sketch blob (exact below k). */
  def thetaEstimate(sketch: Column): Column =
    ColumnBridge.column(ThetaEstimate(ColumnBridge.expression(sketch)))

  /** Sketch-union of two blobs (same k) — itself a sketch. */
  def thetaUnion(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaUnion(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Intersection-cardinality estimate of two sketch blobs. */
  def thetaIntersect(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaIntersect(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
