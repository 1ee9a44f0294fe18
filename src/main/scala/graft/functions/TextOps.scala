package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level text operators for the LLM-data-pipeline queries.
  *
  * Everything here is composed from `org.apache.spark.sql.functions`
  * so the whole pipeline stays inside Catalyst/whole-stage codegen —
  * no Scala UDFs on the hot path. Each builder returns a `Column`
  * that can be projected in a single pass over the corpus.
  */
object TextOps {

  /** Whitespace-normalized, lowercased text — the canonical form for
    * exact dedup. Mirrors `lower(trim(regexp_replace(x,'\s+',' ','g')))`
    * in DuckDB.
    */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** The canonical exact-dedup digest: md5 hex of the normalized text
    * — the ONE definition behind the oracle-verified q30 and every
    * pipeline that must dedup with identical semantics (CorpusPrep,
    * streaming dedup keys derive from the same normText). DuckDB
    * mirror: `md5(lower(trim(regexp_replace(x,'\s+',' ','g'))))`.
    */
  def textDigest(c: Column): Column = md5(normText(c).cast("binary"))

  /** Whitespace tokens of the raw text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Distinct word n-gram shingles (the MinHash/Jaccard unit).
    * Built with sequence+transform so it is one codegen'd projection.
    */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = tokens(normText(c))
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** The minhash modulus: Mersenne prime 2^31-1 (values fit an int;
    * the arithmetic never overflows DuckDB's checked BIGINT either).
    */
  val MinhashM = 2147483647L

  /** The two 60-bit double-hashing bases of a shingle string, from one
    * md5 digest: x1 = parse(md5hex[1..15]) mod M, x2 =
    * parse(md5hex[16..30]) mod (M-1) + 1. md5 is engine-portable, so
    * DuckDB recomputes identical values (the q31/q33 oracles are
    * exact). Returns struct<x1:bigint, x2:bigint>.
    */
  def minhashBases(s: Column): Column = struct(
    (conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")
      % MinhashM).as("x1"),
    (conv(substring(md5(s.cast("binary")), 16, 15), 16, 10).cast("long")
      % (MinhashM - 1) + 1).as("x2"))

  /** MinHash signature: k hash families via Kirsch–Mitzenmacher
    * double hashing h_j = (x1 + j·x2) mod M over one md5 digest per
    * shingle; min over the shingle set per family. Returns array<int>
    * of length k. (Composed form — k interpreted passes; the native
    * Expression in graft.functions.expressions computes identical
    * values in one pass.)
    */
  def minhashSig(shingles: Column, k: Int): Column = {
    val bases = transform(shingles, s => minhashBases(s))
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(bases,
        p => ((p.getField("x1") + j * p.getField("x2")) % MinhashM)
          .cast("int"))))
  }

  /** LSH band keys for a MinHash signature: `b` bands of `r` rows;
    * band i's key is the modular fold h = (h·65539 + v) mod M of its
    * slice, seeded by the slice's first element (identical to DuckDB's
    * list_reduce over the same slice). Docs agreeing on any band land
    * in the same bucket → candidate pair. Returns array<int> of
    * length b (posexplode to get (band_idx, band_key)).
    */
  def bandKeys(sig: Column, b: Int, r: Int): Column =
    transform(sequence(lit(0), lit(b - 1)),
      i => aggregate(
        slice(sig, i * r + 2, lit(r - 1)),
        element_at(sig, i * r + 1).cast("long"),
        (h, v) => (h * 65539L + v) % MinhashM).cast("int"))

  /** Estimated Jaccard from two equal-length MinHash signatures:
    * fraction of agreeing components.
    */
  def sigJaccard(a: Column, b: Column, k: Int): Column =
    aggregate(
      zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / lit(k)

  /** Exact Jaccard of two distinct-element arrays. */
  def exactJaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** A token's 64-bit portable hash: the md5 digest's lower 8 bytes
    * little-endian — DuckDB's md5_number_lower(s) reinterpreted as a
    * signed long (the q32 oracle recomputes it exactly). Assembled
    * from the hex pairs with shift/or only, so checked (ANSI)
    * arithmetic can never overflow.
    */
  def md5Lower64(s: Column): Column = {
    // a null token hashes as the empty string, matching the native
    // SimHash64 (md5(NULL) would otherwise null out the whole vote)
    val hex = md5(coalesce(s, lit("")).cast("binary"))
    // byte j of the digest (j = 8..15) is hex chars (2j+1, 2j+2) and
    // occupies bits 8·(j-8)..8·(j-8)+7 of the little-endian value
    (8 to 15).map { j =>
      call_function("shiftleft",
        conv(substring(hex, 2 * j + 1, 2), 16, 10).cast("long"),
        lit(8 * (j - 8)))
    }.reduce(_ bitwiseOR _)
  }

  /** 64-bit SimHash over a token array: per bit, sum +1/-1 of each
    * token's md5Lower64 bit; bit set iff the sum is positive.
    * Composed from builtin functions (64 passes over the token array
    * per row — fine for correctness; the native Expression in
    * graft.functions.expressions replaces this on the hot path).
    */
  def simhash64(toks: Column): Column = {
    val hashes = transform(toks, t => md5Lower64(t))
    val bits = transform(sequence(lit(0), lit(63)), b =>
      when(
        aggregate(hashes, lit(0), (acc, h) =>
          acc + when(
            call_function("shiftright", h, b)
              .bitwiseAND(lit(1L)) === lit(1L), 1).otherwise(-1)) > 0,
        lit(1L)).otherwise(lit(0L)))
    aggregate(
      zip_with(bits, sequence(lit(0), lit(63)),
        (bit, idx) => call_function("shiftleft", bit, idx)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Pigeonhole block keys for hamming-distance LSH: split a 64-bit
    * simhash into `nBlocks` equal blocks; two hashes within hamming
    * distance (nBlocks-1) agree on at least one block exactly.
    * Returns array<long> of the block values.
    */
  def simhashBlocks(sim: Column, nBlocks: Int): Column = {
    val width = 64 / nBlocks
    val mask = (1L << width) - 1
    transform(sequence(lit(0), lit(nBlocks - 1)),
      i => call_function("shiftright", sim, i * lit(width))
        .bitwiseAND(lit(mask)))
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** The block/cap/verify near-dup chain over any 64-bit Hamming
    * space — ONE definition shared by q32 (SimHash over tokens) and
    * q119 (dHash over pixels): hashes (idCol, hashCol) → verified
    * pairs (doc_a, doc_b, hamming ≤ maxHamming), ordered. Pair
    * generation only inside [[simhashBlocks]] pigeonhole buckets
    * (maxHamming ≤ nBlocks−1 keeps candidates complete), degenerate
    * buckets past `cap` rows skipped (boilerplate-heavy corpora
    * collapse many docs onto one block value → quadratic bucket), the
    * hamming computed and filtered IN-bucket so only real near-dups
    * reach the dedup exchange. `graft.queries.TextQ.hammingPairsSql`
    * is the DuckDB face.
    */
  def hammingPairs(hashes: DataFrame, idCol: String, hashCol: String,
                   nBlocks: Int = 4, cap: Int = 1000,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= nBlocks - 1,
      s"pigeonhole completeness needs maxHamming <= nBlocks-1, " +
        s"got $maxHamming vs $nBlocks blocks")
    val blocked = hashes.select(col(idCol).as("doc_id"),
      col(hashCol).as("_h"),
      posexplode(simhashBlocks(col(hashCol), nBlocks)).as(Seq("blk", "bval")))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk"), col("bval"))
    val capped = blocked
      .withColumn("bucket_n", count(lit(1)).over(wB))
      .filter(col("bucket_n") <= cap)
    val lhs = capped.select(col("blk"), col("bval"),
      col("doc_id").as("doc_a"), col("_h").as("_h_a"))
    val rhs = capped.select(col("blk"), col("bval"),
      col("doc_id").as("doc_b"), col("_h").as("_h_b"))
    lhs.join(rhs, Seq("blk", "bval"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        hamming64(col("_h_a"), col("_h_b")).cast("bigint").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Rolling char-k-gram hashes (the winnowing unit). */
  def charGramHashes(c: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(length(c) - (k - 1), lit(1))),
      i => hash(substr(c, i, lit(k))))

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03 — public
    * algorithm): min hash of every sliding window of `w` consecutive
    * k-gram hashes, deduplicated and sorted. Guarantees any shared
    * substring of length >= w+k-1 yields a shared fingerprint.
    */
  def winnow(gramHashes: Column, w: Int): Column =
    array_sort(array_distinct(
      transform(
        sequence(lit(1), greatest(size(gramHashes) - (w - 1), lit(1))),
        j => array_min(slice(gramHashes, j, lit(w))))))

  /** Language marker profiles for the heuristic language ID. Small,
    * public stopword sets per language.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "ich"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "que", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "una", "que", "por", "con"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"),
  )

  /** Language-ID scores: for each profile, the fraction of tokens
    * that are that language's markers; prediction = argmax (score,
    * then language code as tie-break), confidence = winning score.
    * Returns struct<lang:string, confidence:double>.
    */
  def langId(c: Column): Column = {
    val toks = tokens(normText(c))
    val n = greatest(size(toks), lit(1)).cast("double")
    val scored = langProfiles.map { case (lang, words) =>
      val hits = size(filter(toks, t => t.isin(words: _*)))
      struct((hits.cast("double") / n).as("confidence"), lit(lang).as("lang"))
    }
    // array_max on struct compares fields in order → max score wins,
    // ties broken by the (deterministic) language code.
    val best = array_max(array(scored: _*))
    struct(best.getField("lang").as("lang"),
      best.getField("confidence").as("confidence"))
  }
}
