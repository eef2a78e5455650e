package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
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
}
