package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (shingle → minhash → band →
  * bucket-join), the standard web-scale dedup pipeline. Signatures are
  * k min-aggregations over xxhash64(shingle ⊕ seed) — pure expressions,
  * map-side combinable, one shuffle of (doc_id, 8-byte hashes).
  */
object Dedup {

  /** k-permutation MinHash signature per document over word n-gram shingles. */
  def minHashSignatures(docs: DataFrame, n: Int = 3, k: Int = 16): DataFrame = {
    val shingled = docs.select(col("doc_id"),
        explode(TextOps.wordNgrams(lower(col("text")), n)).as("shingle"))
      .distinct()
    val mins = (0 until k).map(j =>
      min(xxhash64(col("shingle"), lit(j))).as(s"mh$j"))
    shingled.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: `bands` bands of `k/bands` rows each; two docs are
    * candidates if any band agrees fully. Returns exact-verified pairs with
    * estimated Jaccard = fraction of agreeing minhashes (x1000, integer). */
  def minHashPairs(docs: DataFrame, n: Int = 3, k: Int = 16, bands: Int = 4,
      minEstJaccardX1000: Int = 500): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val sigs = minHashSignatures(docs, n, k)
    val banded = sigs.select(col("doc_id") +: (0 until k).map(j => col(s"mh$j")) :+
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            xxhash64((b * r until (b + 1) * r).map(j => col(s"mh$j")): _*).as("key"))): _*)).as("bk"): _*)
      .select(col("doc_id"), col("bk.band"), col("bk.key"),
        array((0 until k).map(j => col(s"mh$j")): _*).as("sig"))
    val agree = (0 until k).map(j =>
      when(element_at(col("a.sig"), j + 1) === element_at(col("b.sig"), j + 1), 1)
        .otherwise(0)).reduce(_ + _)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (agree * 1000 / k).cast("long").as("est_jaccard_x1000"))
      .distinct()
      .filter(col("est_jaccard_x1000") >= minEstJaccardX1000)
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding-cosine near-dup: pairs with cosine ≥ threshold among LSH
    * bucket collisions (scale path: no O(n²) cross join; the signature
    * bucket join prunes candidates). */
  def embeddingNearDups(emb: DataFrame, dim: Int, thresholdX10000: Int = 9500,
      nPlanes: Int = 12): DataFrame = {
    val sigd = VectorOps.lshSignature(emb, dim, nPlanes)
      .select(col("vec_id"), col("embedding"), col("lsh_sig"))
    sigd.as("a").join(sigd.as("b"),
        col("a.lsh_sig") === col("b.lsh_sig") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(VectorOps.cosine(col("a.embedding"), col("b.embedding")) * 10000).cast("long")
          .as("cos_x10000"))
      .filter(col("cos_x10000") >= thresholdX10000)
      .orderBy("vec_a", "vec_b")
  }
}
