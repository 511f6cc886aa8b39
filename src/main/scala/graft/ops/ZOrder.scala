package graft.ops

import graft.functions.ZValue
import org.apache.spark.sql.{Column, DataFrame}

/** Z-order layout clustering: re-cluster a table so each output file covers
  * a small n-dimensional box instead of a slab of one dimension. Pair with
  * any sink (`.write.parquet`, the graft connector) — the win is in the
  * per-file min/max envelopes, not the file format. See [[ZValue]] for the
  * full layout argument; ZOrderSpec measures the effect (files touched by a
  * 2-dim box predicate, Z vs single-dim layout).
  *
  * `repartitionByRange` on the z-key samples the key distribution, so file
  * boundaries adapt to data skew (dense z-regions get more files) — the
  * same property that makes it the right tool for sorted writes generally.
  * The extra `sortWithinPartitions` tightens ROW-GROUP (not just file)
  * envelopes for multi-row-group files at real scale; at 100 TB you'd pick
  * `nFiles` so files land near the row-group size you want.
  *
  * Inputs should be quantized coordinates (bucket indices, not raw skewed
  * values) — [[ZValue]] masks to its bit budget, so feeding raw 64-bit
  * values silently wraps; [[graft.functions.ChunkOf]] is the natural
  * quantizer for world dims.
  */
object ZOrder {

  /** The Morton key for `dims` (see [[ZValue]]). */
  def zvalue(dims: Column*): Column = ZValue(dims.head, dims.tail: _*)

  /** Re-cluster `df` into `nFiles` z-ordered ranges. */
  def cluster(df: DataFrame, nFiles: Int, dims: Column*): DataFrame = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val z = zvalue(dims: _*)
    df.repartitionByRange(nFiles, z).sortWithinPartitions(z)
  }
}
