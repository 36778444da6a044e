package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** THE engine hash family — shared by [[Bloom]] and [[CountMin]] (and
  * mirrored in their oracle SQL): row j maps key `id` to slot
  * `((A0·(j+1)) mod P · pmod(id, P) + (B0·(j+1)) mod P) mod P mod slots`.
  * One definition so the family cannot silently diverge between the
  * sketches the determinism docs treat as one thing. `pmod` (not signed
  * `%`) on the key: a negative BIGINT id under signed remainder would
  * produce a negative slot; on nonnegative ids pmod ≡ %, so the oracle
  * SQL's plain `%` matches bit-for-bit. Every term is nonnegative and the
  * largest product (P−1)² < 2⁶³ cannot wrap.
  */
private[functions] object AffineHash {

  val P = 2147483647L
  val A0 = 2654435761L
  val B0 = 40503L

  /** Row j's slot for key `id`, in [0, slots). */
  def slot(j: Column, id: Column, slots: Int): Column =
    ((lit(A0) * (j + 1)) % P * pmod(id, lit(P)) + (lit(B0) * (j + 1)) % P) % P % slots

  /** Broadcast 0..rows−1 as column `name` (the hash-row fan-out side). */
  def rows(df: DataFrame, n: Int, name: String): DataFrame =
    broadcast(df.sparkSession.range(n).select(col("id").as(name)))
}
