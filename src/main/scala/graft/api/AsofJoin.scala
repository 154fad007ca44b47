package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward-looking temporal) join: for each left row, the most recent
  * right row with `right.ts <= left.ts` within the same key — the standard
  * operator for joining events to slowly-changing reference data.
  *
  * Spark has no native ASOF JOIN. A naive formulation (`ON r.ts <= l.ts`,
  * then keep the max) is a range join → nested-loop cross product. This
  * implementation is the scalable union-and-carry shape: tag both sides,
  * union, sort within each key by (ts, side), and carry the last right row
  * forward with a window `last(..., ignoreNulls)` — two shuffles total
  * (union repartition + window), no pair explosion, skew-bounded by key
  * cardinality. The same shape works unchanged at 100 TB because the window
  * never materializes pairs.
  */
object AsofJoin {

  /** @param left       probe side (keeps all rows)
    * @param right      reference side (its `valueCols` are carried forward)
    * @param keyCols    equality keys present on both sides
    * @param tsCol      timestamp column name (both sides)
    * @param valueCols  right-side columns to attach (null when no right row
    *                   at-or-before the left timestamp exists)
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String], tsCol: String,
           valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // All value columns of a right row travel as ONE struct, carried by ONE
    // last(ignoreNulls = true): the attached values therefore always come
    // from the same most-recent right row, including that row's NULL fields.
    // A per-column carry would instead skip a legitimately-NULL value and
    // could combine fields from different right rows.
    val vStruct = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c).copy(nullable = true)))
    // side ordinal: right rows sort BEFORE left rows at equal timestamps so a
    // same-instant right row is visible to the left row (<= semantics)
    var r = right.select((keyCols :+ tsCol).map(col) :+
        struct(valueCols.map(col): _*).as("__v"): _*)
      .withColumn("__side", lit(0))
    // align schemas for the union
    for (c <- leftCols if !keyCols.contains(c) && c != tsCol)
      r = r.withColumn(c, lit(null).cast(left.schema(c).dataType))
    val lAligned = left
      .withColumn("__v", lit(null).cast(vStruct))
      .withColumn("__side", lit(1))
    val unioned = lAligned.select(leftCols.map(col) :+ col("__v") :+ col("__side"): _*)
      .unionByName(r.select(leftCols.map(col) :+ col("__v") :+ col("__side"): _*))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof", last(col("__v"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }
}
