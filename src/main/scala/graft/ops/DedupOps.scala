package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deduplication primitives for large-scale training-data pipelines, built
  * from codegen'd built-ins so they scale as ordinary Catalyst plans:
  * exact (normalized-hash groupBy), MinHash+LSH banding (shingle → minhash →
  * band → bucket equi-join — the shuffle is on band keys, never all-pairs),
  * SimHash (hamming blocks via pigeonhole chunks), and token-set Jaccard.
  */
object DedupOps {

  /** Whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Distinct token set (Jaccard/MinHash input). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Token-set Jaccard similarity, computed as exact integer set sizes
    * divided in double (engine-deterministic). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** MinHash signature: `numHashes` permutations simulated by salted
    * xxhash64; signature element i = min over tokens of hash_i(token). */
  def minhashSignature(toks: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(toks, t => xxhash64(t, lit(i))))
    }: _*)

  /** LSH band keys: signature split into `numBands` rows-per-band groups;
    * two documents collide in a band iff that band's slice matches exactly.
    * Key embeds the band index so buckets of different bands never join. */
  def bandKeys(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      concat_ws(":", lit(b),
        array_join(transform(slice(sig, b * rowsPerBand + 1, rowsPerBand),
          x => x.cast("string")), ","))
    }: _*)

  /** 64-bit SimHash over a token array: bit k is set iff the sum over tokens
    * of ±1 (sign from bit k of the token's hash) is non-negative. The token
    * hashes are a shared subexpression across the 64 per-bit aggregates;
    * codegen subexpression elimination computes them once per row. */
  def simhash(toks: Column): Column = {
    val hashes = transform(toks, t => xxhash64(t))
    val bits = (0 until 64).map { k =>
      when(aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftrightunsigned(h, k).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)
      ) >= 0, lit(1L << k)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Pigeonhole blocks for hamming-distance search: 4 16-bit chunks of the
    * simhash — any pair within hamming distance 3 shares ≥1 exact chunk. */
  def simhashChunks(sim: Column): Column =
    array((0 until 4).map { c =>
      concat_ws(":", lit(c),
        shiftright(sim, c * 16).bitwiseAND(0xffffL).cast("string"))
    }: _*)

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
