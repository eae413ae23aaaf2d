package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Z-order (Morton) file clustering: the write-side layout lever for 2-D
  * range scans over fact tables. A table sorted by ONE column gives tight
  * min/max file statistics on that column only; sorting by the interleaved
  * Morton key of two columns makes every file a ~square box in both
  * dimensions, so parquet min/max data skipping prunes scans that filter on
  * EITHER or BOTH — the property single-column sorts cannot provide.
  *
  * At 100 TB this is a one-off (or compaction-time) reshuffle whose cost is
  * repaid by every subsequent selective scan; the key computation itself is
  * a codegen'd expression ([[graft.exprs.ZOrder16]]), and the clustering is
  * a plain `repartitionByRange` + `sortWithinPartitions` — Spark's range
  * exchange samples the key distribution, so skewed dimensions still yield
  * balanced files. LayoutSpec pins the observable contract: per-file
  * (min, max) boxes under the Z layout prune a thin-rectangle query that a
  * single-column sort cannot prune at all.
  */
object Layout {

  /** Morton sort key over two dimensions pre-quantized into 0..65535.
    * Callers quantize wider/continuous dimensions into that range first —
    * rank-preserving quantization keeps pruning exact: the file boxes are
    * computed on the STORED columns, the key only orders rows.
    *
    * The range is ENFORCED, not assumed: the interleave keeps only the
    * low 16 bits, so a negative or >65535 input would otherwise alias
    * into a wrong Morton key and silently destroy clustering quality
    * (a layout bug no query result ever exposes — pruning just stops
    * working). Out-of-range inputs raise; nulls pass through as null
    * (the kernel's existing null semantics). */
  def zkey(x: Column, y: Column): Column =
    graft.exprs.functions.zorder16(ranged16(x, "x"), ranged16(y, "y"))

  private def ranged16(c: Column, dim: String): Column = {
    val v = c.cast("long")
    when(v < 0L || v > 65535L,
      raise_error(concat(
        lit(s"Layout.zkey: $dim outside [0, 65535] — quantize the "),
        lit("dimension into 16-bit buckets before keying; got "),
        v.cast("string"))))
      .otherwise(v).cast("int")
  }

  /** Cluster `df` into `partitions` Z-ordered output splits. The key is
    * dropped after ordering: pruning works off parquet's own min/max
    * stats on the data columns, no persisted derived column needed. */
  def clusterByZ(df: DataFrame, x: Column, y: Column, partitions: Int): DataFrame = {
    val keyed = df.withColumn("__zkey", zkey(x, y))
    keyed.repartitionByRange(partitions, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }
}
