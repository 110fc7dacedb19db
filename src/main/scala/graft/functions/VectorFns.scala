package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector/embedding column functions (similarity-search extensions).
  *
  * Two families:
  *   - `q*` (quantized): embeddings scaled to integer milliunits so dot
  *     products are exact integer arithmetic — bit-identical across
  *     engines and across cluster layouts. Used by every oracle-checked
  *     query.
  *   - float-path helpers (`dotF`, `cosineF`) for raw-throughput use
  *     where cross-engine determinism doesn't matter.
  *
  * All pure expressions (higher-order functions) — no UDF, no
  * serialization off the codegen path.
  */
object VectorFns {

  /** float array -> exact milliunit longs: floor(x*1000 + 0.5).
    * `floor` (not round) because floor is IEEE-identical everywhere,
    * while round-half modes differ between engines.
    */
  def quantize(v: Column, scale: Int = 1000): Column =
    transform(v, x => floor(x.cast("double") * scale + 0.5d).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Exact integer squared L2 norm. */
  def qnorm2(a: Column): Column =
    aggregate(a, lit(0L), (acc, x) => acc + x * x)

  /** Deterministic cosine from precomputed quantized parts:
    * dot / sqrt(n2a * n2b), all IEEE-exact given exact integer inputs
    * (single sqrt on the product, so no sqrt(a)*sqrt(b) reassociation).
    */
  def qcosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / sqrt((n2a * n2b).cast("double"))

  /** Float-path dot product (throughput variant; not oracle-safe). */
  def dotF(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y),
      lit(0.0d), (acc, x) => acc + x)

  def cosineF(a: Column, b: Column): Column =
    dotF(a, b) / sqrt(dotF(a, a) * dotF(b, b))
}
