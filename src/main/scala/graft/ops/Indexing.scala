package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{col, lit, shiftleft, shiftright}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global row numbering (SURVEY §2.6 W-family, the scale
  * path). The naive spelling — `row_number() OVER (ORDER BY key)` with
  * no partition — range-shuffles the WHOLE dataset into ONE task for the
  * window: the classic driver-shaped bottleneck that works at 60k rows
  * and dies at 100 TB.
  */
object Indexing {

  /** Contiguous, deterministic 0..n-1 index in `orderCol` order, with no
    * single-partition stage: range-repartition by the key, sort within
    * partitions, then the classic two-pass zipWithIndex — one lightweight
    * job counts rows per partition (longs to the driver, nothing more),
    * then each partition stamps `offset + local position` independently.
    *
    * `orderCol` must totally order the rows (unique key): the index is
    * then a pure function of the data, independent of partition count or
    * range-sampling boundaries. Cost: one range shuffle + one extra
    * count-only job — at any scale, strictly cheaper than the
    * single-task global window it replaces.
    */
  def globalIndex(df: DataFrame, orderCol: String,
                  idxCol: String = "idx"): DataFrame = {
    val sorted = df.repartitionByRange(col(orderCol))
      .sortWithinPartitions(orderCol)
    val out = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(out,
      StructType(sorted.schema.fields :+
        StructField(idxCol, LongType, nullable = false)))
  }

  /** Z-order (Morton) key: interleave the low `bits` bits of two
    * non-negative integral columns — bit i of `x` lands at position
    * 2i+1, bit i of `y` at 2i. Sorting or range-partitioning by the key
    * co-locates rows that are close in BOTH dimensions, so a 2-D range
    * predicate (x range × y range) prunes files/row-groups instead of
    * reading full stripes of one dimension — the data-layout clustering
    * trick behind Delta/Iceberg OPTIMIZE ZORDER, as a plain codegen'd
    * column expression (map-side, shuffle-free).
    */
  def zOrderKey(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
}
