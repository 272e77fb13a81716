package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding columns — the
  * storage-side lever for vector search at 100 TB: codes are 1 byte per
  * dimension vs 4 for float32, so a quantized scan reads ~25 % of the
  * bytes (and parquet dictionary/RLE often shrinks it further). The
  * standard serving trade (faiss SQ8-style): score on dequantized
  * values, keep the float column only for exact re-rank.
  *
  * All arithmetic is plain Spark SQL HOFs (`transform`/`array_max`) —
  * codegen'd, no UDF — and written with an engine-neutral op sequence
  * (`floor(x/scale + 0.5)`, double math) so a DuckDB oracle reproduces
  * the codes bit-for-bit.
  */
object Quantize {

  /** per-vector scale: max |x| mapped to 127 (1e-30 floor guards the
    * zero vector — its codes become 0, not NaN).
    */
  def scaleCol(vec: Column): Column =
    greatest(array_max(transform(vec, x => abs(x.cast("double")))), lit(1e-30)) / lit(127.0)

  /** int8 codes: round-half-up of x/scale, in [-127, 127]. */
  def encode(vec: Column, scale: Column): Column =
    transform(vec, x => floor(x.cast("double") / scale + lit(0.5)).cast("tinyint"))

  /** dequantized doubles: code * scale (max abs error = scale/2). */
  def decode(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)
}
