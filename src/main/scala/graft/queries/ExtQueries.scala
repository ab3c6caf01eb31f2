package graft.queries

import graft.{QueryDef, Sql, Tables}
import graft.ops.{Curation, Dedup, Diff, Multimodal, Packing, Pq, Profiling, QualityFunnel, Retrieval, Sampling, Sessionize, Similarity, SpanDedup, TextOps}
import org.apache.spark.sql.functions._

/** EXT1–EXT6 (SURVEY.md §2.11) — the LLM-training-data-pipeline operators,
  * each registered with a DuckDB oracle wherever DuckDB can express the
  * semantics portably — including SimHash since round 9: the signature's
  * token hash is derived from standard MD5 nibbles (Dedup.simhash), so
  * the oracle replays the exact 64-bit signatures and the banded pair
  * set in SQL. Only truly engine-randomized state (sketch internals)
  * remains rows-only + ScalaTest.
  *
  * Notable oracle: `ext2_minhash_lsh` is checked against the *exact*
  * all-pairs Jaccard ground truth — green means the LSH path achieved 100%
  * recall/precision at the threshold on this corpus, a far stronger check
  * than comparing the LSH mechanics.
  */
object ExtQueries {

  /** DuckDB mirror of [[graft.ops.Dedup.simhash]]: 64-bit signatures from
    * MD5-nibble token hashes over distinct whitespace tokens. Generated
    * SQL (16 nibble extractions, 64 bit-sum aggregates, 64 sign terms) —
    * the same formulas the Spark expressions evaluate, so the signature
    * matches bit-for-bit. Bit 63's weight is −2⁶³ (BIGINT two's
    * complement), written `-9223372036854775807 - 1` because the bare
    * literal would parse as HUGEINT in DuckDB. */
  private val SimhashCte: String = {
    val nibbles = (1 to 16).map { i =>
      val a = s"ascii(substring(hx, $i, 1))"
      s"CASE WHEN $a >= 97 THEN $a - 87 ELSE $a - 48 END AS n$i"
    }.mkString(",\n         ")
    val bitSums = (0 until 64).map { b =>
      s"SUM(CASE WHEN (n${b / 4 + 1} // ${1 << (b % 4)}) % 2 = 1 THEN 1 ELSE -1 END) AS s_$b"
    }.mkString(",\n         ")
    val sigTerms = (0 until 64).map { b =>
      val weight = if (b == 63) "-9223372036854775807 - 1" else (1L << b).toString
      s"CASE WHEN s_$b > 0 THEN $weight ELSE 0 END"
    }.mkString(" + ")
    s"""WITH toks AS (
       |  SELECT DISTINCT doc_id, tok FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |), hx AS (
       |  SELECT doc_id, substring(md5(tok), 1, 16) AS hx FROM toks
       |), nib AS (
       |  SELECT doc_id,
       |         $nibbles
       |  FROM hx
       |), bitsum AS (
       |  SELECT doc_id,
       |         $bitSums
       |  FROM nib GROUP BY doc_id
       |), sig AS (
       |  SELECT doc_id, CAST($sigTerms AS BIGINT) AS simhash FROM bitsum
       |)
       |""".stripMargin
  }

  /** DuckDB mirror of [[graft.ops.Multimodal.perceptualHash]]: 65
    * nearest-neighbor character samples at ⌊i·n/65⌋ (integer division —
    * Spark's floor-of-double form is exact for these magnitudes), dHash
    * bit i = (sample_i > sample_{i+1}). Same −2⁶³ literal trick as
    * [[SimhashCte]] for bit 63. */
  private def phashCte(source: String, extraCtes: String = ""): String = {
    val samples = (0 to 64).map { i =>
      s"ascii(substring(text, CAST(length(text) * $i // 65 AS BIGINT) + 1, 1)) AS c_$i"
    }.mkString(",\n         ")
    val sigTerms = (0 until 64).map { b =>
      val weight = if (b == 63) "-9223372036854775807 - 1" else (1L << b).toString
      s"CASE WHEN c_$b > c_${b + 1} THEN $weight ELSE 0 END"
    }.mkString(" + ")
    s"""WITH ${extraCtes}samp AS (
       |  SELECT doc_id AS media_id,
       |         $samples
       |  FROM $source
       |), ph AS (
       |  SELECT media_id, CAST($sigTerms AS BIGINT) AS phash FROM samp
       |)
       |""".stripMargin
  }

  private val PhashCte: String = phashCte("documents")

  /** The fixture corpus has NO perceptual dups (measured min pairwise
    * dHash hamming = 13 at sf0.01), so a registered near-dup lane over
    * raw documents would be a 0-row green that verifies nothing. The
    * lane therefore PLANTS deterministic re-encoded copies (every
    * 97th doc, id-shifted) on both sides — the pair path stays under
    * real oracle verification: the banded join must find exactly the
    * planted hamming-0 pairs and no false positives vs brute force. */
  private val PlantedCopiesSql: String =
    """planted AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 97 = 0
      |), """.stripMargin

  /** DuckDB mirror of TextOps.shingles/jaccard ground truth on documents. */
  private val DocShinglesCte: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), shing AS (
      |  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |                                FOR i IN range(1, len(t) - 1)]) AS sh
      |  FROM toks WHERE len(t) >= 3
      |), inv AS (
      |  SELECT doc_id, unnest(sh) AS shingle FROM shing
      |), pair_common AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), sizes AS (
      |  SELECT doc_id, len(sh) AS n_sh FROM shing
      |), jac AS (
      |  SELECT doc_a, doc_b,
      |         CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) AS jaccard
      |  FROM pair_common
      |  JOIN sizes sa ON doc_a = sa.doc_id
      |  JOIN sizes sb ON doc_b = sb.doc_id
      |)
      |""".stripMargin

  /** EXT20 ground truth: the same shingling as [[DocShinglesCte]], split
    * into train (doc_id % 5 ≠ 0) / eval (doc_id % 5 = 0) corpora, with
    * `ov` = per-pair containment of the eval doc's shingle set. */
  private val DecontamCtes: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), shing AS (
      |  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |                                FOR i IN range(1, len(t) - 1)]) AS sh
      |  FROM toks WHERE len(t) >= 3
      |), inv AS (
      |  SELECT doc_id, unnest(sh) AS shingle FROM shing
      |), common AS (
      |  SELECT tr.doc_id AS train_doc, ev.doc_id AS eval_doc, COUNT(*) AS common
      |  FROM (SELECT * FROM inv WHERE doc_id % 5 <> 0) tr
      |  JOIN (SELECT * FROM inv WHERE doc_id % 5 = 0) ev ON tr.shingle = ev.shingle
      |  GROUP BY 1, 2
      |), ov AS (
      |  SELECT eval_doc, train_doc,
      |         CAST(common AS DOUBLE) / len(sh) AS overlap
      |  FROM common JOIN shing ON eval_doc = shing.doc_id
      |)
      |""".stripMargin

  /** EXT20's hot-shingle cap. Measured fixture max train doc-frequency:
    * 6 at sf0.01, 21 at sf0.1; ScaleUp's per-replica word permutation
    * keeps shingles replica-local, so sf1 stays in the same decade. 200
    * clears all of those with an order of magnitude to spare — the cap
    * never binds on driver data (oracle stays the exact intersection)
    * while the registered plan is the guarded production shape. */
  private val DecontamTrainDfCap = 200L

  private val JaccardSelect: String =
    s"""SELECT doc_a, doc_b, ${Sql.rnd("jaccard", 4)} AS jaccard
       |FROM jac WHERE jaccard >= 0.5""".stripMargin

  /** The EXT7 composite CTE chain: quality gate + exact dedup, then the
    * shingle/jaccard ground-truth CTEs re-pointed at the `exact` corpus.
    * Shared by the greedy and the clustered cleaning oracles. */
  private val CleanCorpusCtes: String =
    DocShinglesCte.replace("WITH toks AS", "WITH quality AS (\n" +
      s"""  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |         ${Sql.rnd("CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(string_split(text, ' '))", 4)} AS stopword_ratio
         |  FROM documents
         |), passing AS (
         |  SELECT d.doc_id, d.text FROM documents d JOIN quality q ON d.doc_id = q.doc_id
         |  WHERE q.n_tokens >= 10 AND q.stopword_ratio <= 0.5
         |), exact AS (
         |  SELECT p.doc_id, p.text FROM passing p
         |  JOIN (SELECT text, MIN(doc_id) AS doc_id FROM passing GROUP BY 1) k
         |    ON p.doc_id = k.doc_id
         |), toks AS""".stripMargin) // shingle/jaccard CTEs now run over `exact`
      .replace("SELECT doc_id, string_split(text, ' ') AS t FROM documents",
        "SELECT doc_id, string_split(text, ' ') AS t FROM exact")

  /** DuckDB mirror of Similarity.cosine: DOUBLE[] dot products (sequential
    * sum, bit-identical to Spark's aggregate fold). */
  private val CosineCte: String =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings
      |), q AS (
      |  SELECT vec_id AS q_id, label AS q_label, emb AS q_emb, nrm AS q_nrm
      |  FROM e WHERE vec_id % 50 = 0
      |)
      |""".stripMargin

  val all: Seq[QueryDef] = main ++ Ext35

  private def main: Seq[QueryDef] = Seq(

    // ── EXT1 — exact dedup, keep-first-by-timestamp per (user, channel):
    //    row_number window = 1 (the reference never dedups; this is the
    //    training-pipeline staple).
    QueryDef(
      "ext1_dedup_exact",
      (s, d) =>
        Dedup.keepFirst(Tables.sessions(s, d), Seq("user_id", "channel_name"), "ts", "session_id")
          .select("user_id", "channel_name", "session_id"),
      Some(Sql.CTES +
        """SELECT user_id, channel_name, session_id FROM (
          |  SELECT user_id, channel_name, session_id,
          |         ROW_NUMBER() OVER (PARTITION BY user_id, channel_name
          |                            ORDER BY ts, session_id) AS rn
          |  FROM sessions) t WHERE rn = 1""".stripMargin)),

    // ── EXT2a — exact n-gram Jaccard near-dup pairs (inverted-index
    //    join). The prefix-filtered exact path (Dedup.jaccardPairsPrefix,
    //    PPJoin-family) exists for Zipfian real-corpus vocabularies but
    //    is NOT registered here: this fixture's 31-word vocabulary gives
    //    every shingle df ≈ 100 (no rare-shingle prefixes to exploit),
    //    and measured 6× SLOWER than the naive join at sf0.1 — see the
    //    jaccardPairsPrefix scaladoc for the full analysis.
    QueryDef(
      "ext2_ngram_jaccard",
      (s, d) => Dedup.jaccardPairs(Tables.documents(s, d)),
      Some(DocShinglesCte + JaccardSelect),
      bench = true),

    // ── EXT2b — MinHash+LSH near-dup (scale path), oracled against the
    //    exact ground truth: green ⇔ perfect recall+precision here.
    QueryDef(
      "ext2_minhash_lsh",
      (s, d) => Dedup.minhashLshPairs(Tables.documents(s, d)),
      Some(DocShinglesCte + JaccardSelect),
      bench = true),

    // ── EXT2b' — the SCALE-SAFE LSH configuration (minBandMatches=2),
    //    under the SAME exact-Jaccard oracle. m=1 above is the classic
    //    recall-floor baseline but DNF'd at the sf10 century scale-up
    //    (~17 M chance band collisions on the uniform-df vocabulary —
    //    BASELINE.md round-8 century); m=2 is the configuration you'd
    //    actually run at 100 TB, so it is the one that must sit under
    //    continuous oracle verification. Green ⇔ the 2-band agreement
    //    rule loses zero true pairs on this corpus (also pinned by
    //    DedupSimilaritySpec's m-of-b fixture test).
    QueryDef(
      "ext2_minhash_lsh_guarded",
      (s, d) => Dedup.minhashLshPairs(Tables.documents(s, d), minBandMatches = 2),
      Some(DocShinglesCte + JaccardSelect),
      bench = true),

    // ── EXT2c — SimHash signatures. Full oracle since round 9: the
    //    token hash is MD5-nibble-derived (portable), so DuckDB replays
    //    the exact 64-bit signatures — green ⇔ bit-identical fingerprints.
    QueryDef(
      "ext2_simhash",
      (s, d) => Dedup.simhash(Tables.documents(s, d)),
      Some(SimhashCte + "SELECT doc_id, simhash FROM sig")),

    // ── EXT3 — brute-force top-k cosine (broadcast queries, no shuffle
    //    until the per-query top-k).
    QueryDef(
      "ext3_topk_cosine",
      (s, d) => Similarity.topK(Tables.embeddings(s, d)),
      Some(CosineCte +
        s"""SELECT q_id, vec_id, rk, ${Sql.rnd("sim", 6)} AS sim FROM (
           |  SELECT q.q_id, e.vec_id,
           |         ROW_NUMBER() OVER (PARTITION BY q.q_id
           |                            ORDER BY list_dot_product(q.q_emb, e.emb) / (q.q_nrm * e.nrm) DESC,
           |                                     e.vec_id) AS rk,
           |         list_dot_product(q.q_emb, e.emb) / (q.q_nrm * e.nrm) AS sim
           |  FROM q JOIN e ON e.vec_id <> q.q_id) t
           |WHERE rk <= 10""".stripMargin),
      bench = true),

    // ── EXT3b — IVF-style blocked top-k (label = coarse cell). In the
    //    headline bench since round 7: this is the ANN shape you'd run
    //    at 100 TB (equi-join on the cell, never corpus × queries), so a
    //    perf regression here must be driver-visible, not only the
    //    brute-force ground-truth lane's.
    QueryDef(
      "ext3_topk_blocked",
      (s, d) => Similarity.topKBlocked(Tables.embeddings(s, d)),
      Some(CosineCte +
        s"""SELECT q_id, vec_id, rk, ${Sql.rnd("sim", 6)} AS sim FROM (
           |  SELECT q.q_id, e.vec_id,
           |         ROW_NUMBER() OVER (PARTITION BY q.q_id
           |                            ORDER BY list_dot_product(q.q_emb, e.emb) / (q.q_nrm * e.nrm) DESC,
           |                                     e.vec_id) AS rk,
           |         list_dot_product(q.q_emb, e.emb) / (q.q_nrm * e.nrm) AS sim
           |  FROM q JOIN e ON e.label = q.q_label AND e.vec_id <> q.q_id) t
           |WHERE rk <= 5""".stripMargin),
      bench = true),

    // ── EXT3c — sign-random-projection LSH ANN (hash-bucketed scale
    //    path). The hyperplanes are deterministic Scala arithmetic DuckDB
    //    can't mirror — but at probeBits=4 the fixture recall is exactly
    //    1.00 (verified at sf0.001/0.01/0.1), so the LSH result EQUALS
    //    the brute-force top-k and the exact-cosine SQL is a valid
    //    oracle. This graduates the row from rows-only to the strongest
    //    available check: any recall regression (a plane-derivation or
    //    probe bug, a bucket-join change) hash-fails the row instead of
    //    hiding behind a row count.
    QueryDef(
      "ext3_topk_lsh",
      (s, d) => Similarity.topKLsh(Tables.embeddings(s, d)),
      Some(CosineCte +
        s"""SELECT q_id, vec_id, rk, ${Sql.rnd("sim", 6)} AS sim FROM (
           |  SELECT q.q_id, e.vec_id,
           |         ROW_NUMBER() OVER (PARTITION BY q.q_id
           |                            ORDER BY list_dot_product(q.q_emb, e.emb) / (q.q_nrm * e.nrm) DESC,
           |                                     e.vec_id) AS rk,
           |         list_dot_product(q.q_emb, e.emb) / (q.q_nrm * e.nrm) AS sim
           |  FROM q JOIN e ON e.vec_id <> q.q_id) t
           |WHERE rk <= 10""".stripMargin)),

    // ── EXT3d — IVF top-k with a TRAINED k-means quantizer (Lloyd's
    //    iterations in Similarity.kmeansCentroids; assignment + probing
    //    are graft_dot expressions against centroid literals). Training
    //    is reproducible only up to float summation order in the update
    //    step — borderline vectors can flip cells run-to-run — so the
    //    raw top-k rows cannot be hash-compared. Instead the row emits a
    //    deterministic RECALL SCORECARD: the IVF result is scored
    //    in-engine against the exact brute-force top-k, and the output
    //    is (n_queries, recall_floor, recall_ok) where recall_ok ⇔ mean
    //    recall ≥ the floor. Any quantizer/probe regression flips
    //    recall_ok to false and hash-fails the row — a pass/fail the
    //    driver sees, not just a ScalaTest. (Raw IVF row shape stays
    //    covered by DedupSimilaritySpec.)
    QueryDef(
      "ext3_topk_ivf",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity
          .recallPerQuery(Similarity.topK(e), Similarity.topKIvf(e, nProbe = 8))
          .agg(
            count(lit(1)).as("n_queries"),
            lit(0.7).as("recall_floor"),
            (avg(col("recall")) >= 0.7).as("recall_ok"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_queries,
             |       0.7 AS recall_floor, true AS recall_ok
             |FROM embeddings WHERE vec_id % 50 = 0""".stripMargin)),

    // ── EXT3e — product-quantized ANN (ADC scan over 16-code rows + exact
    //    re-rank of the top-100 candidates; ops/Pq.scala). Same scorecard
    //    protocol as ext3_topk_ivf — codebook training is float-order
    //    sensitive, so the row emits the deterministic recall gate, not
    //    raw top-k rows (those are covered by PqSpec, floor 0.9; the
    //    registered floor stays at the family's 0.7 so the driver row is
    //    stable across scale factors while the spec catches drift early).
    QueryDef(
      "ext3_topk_pq",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity
          .recallPerQuery(Similarity.topK(e), Pq.topKPq(e))
          .agg(
            count(lit(1)).as("n_queries"),
            lit(0.7).as("recall_floor"),
            (avg(col("recall")) >= 0.7).as("recall_ok"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_queries,
             |       0.7 AS recall_floor, true AS recall_ok
             |FROM embeddings WHERE vec_id % 50 = 0""".stripMargin)),

    // ── EXT3f — IVF-PQ composed index (Pq.topKIvfPq): the lake-scale ANN
    //    layout — IVF cells prune WHICH rows a query scores (equi-join on
    //    cell, never a full scan), PQ codes compress WHAT those rows read
    //    (16 ints + 1 float, not 64 floats), exact re-rank on the
    //    survivors. Same scorecard protocol as the sibling lanes (both
    //    trainings are float-order sensitive); PqSpec holds the raw
    //    recall to ≥0.9 while the registered family floor stays 0.7.
    QueryDef(
      "ext3_topk_ivfpq",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity
          .recallPerQuery(Similarity.topK(e), Pq.topKIvfPq(e))
          .agg(
            count(lit(1)).as("n_queries"),
            lit(0.7).as("recall_floor"),
            (avg(col("recall")) >= 0.7).as("recall_ok"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_queries,
             |       0.7 AS recall_floor, true AS recall_ok
             |FROM embeddings WHERE vec_id % 50 = 0""".stripMargin)),

    // ── EXT2d — embedding-cosine near-dup pairs (empty on this fixture —
    //    max pair cosine ≈ 0.51 — and the oracle proves the emptiness).
    QueryDef(
      "ext2_embed_neardup",
      (s, d) => Similarity.nearDupPairs(Tables.embeddings(s, d)),
      Some(CosineCte +
        s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |       ${Sql.rnd("list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm)", 6)} AS sim
           |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
           |WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) >= 0.95""".stripMargin)),

    // ── EXT2d-ivf — embedding near-dup over TRAINED cells (no blocking
    //    column needed; multi-assignment covers cell boundaries). The
    //    fixture alone has NO pairs at cosine ≥ 0.95 (all-pairs max is
    //    ≈ 0.513), which would make this a vacuous 0-row check — so the
    //    query plants exact duplicates (every 10th vector re-inserted
    //    under vec_id + 10⁷) and the oracle recomputes the EXACT
    //    all-pairs ground truth over the same planted corpus. Identical
    //    vectors probe identical cells whatever the trained centroids
    //    converge to, so IVF recall on the planted pairs is 100% by
    //    construction and the hash compare is exact — the same
    //    LSH-vs-exact-ground-truth pattern as ext2_minhash_lsh.
    QueryDef(
      "ext2_embed_neardup_ivf",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val planted = e.filter(col("vec_id") % 10 === 0)
          .withColumn("vec_id", col("vec_id") + lit(10000000L))
        Similarity.nearDupPairsIvf(e.unionByName(planted))
      },
      Some(s"""WITH pe AS (
              |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
              |  UNION ALL
              |  SELECT vec_id + 10000000, CAST(embedding AS DOUBLE[]) AS emb
              |  FROM embeddings WHERE vec_id % 10 = 0
              |), e AS (
              |  SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM pe
              |)
              |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              |       ${Sql.rnd("list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm)", 6)} AS sim
              |FROM e a JOIN e b ON a.vec_id < b.vec_id
              |WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) >= 0.95""".stripMargin)),

    // ── EXT2c-pairs — SimHash banded near-dup pairs. Oracle = brute-force
    //    hamming over the replayed signatures (xor + bit_count): green ⇔
    //    the pigeonhole band-join achieved exact recall AND precision at
    //    maxHamming=3 on this corpus — the banded-vs-brute equality the
    //    DedupSimilaritySpec pins at sf0.001, now continuously verified
    //    at the driver's sf. The O(n²) side lives in the ORACLE only;
    //    the engine path stays band-bucketed.
    QueryDef(
      "ext2_simhash_pairs",
      (s, d) => Dedup.simhashPairs(Tables.documents(s, d)),
      Some(SimhashCte +
        """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
          |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
          |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin)),

    // ── EXT4f — TF-IDF (ln parity between java.lang.Math.log and DuckDB
    //    verified by the oracle; inputs are exact small-int ratios).
    QueryDef(
      "ext4_tfidf",
      (s, d) => TextOps.tfIdf(Tables.documents(s, d)),
      Some(s"""WITH tf AS (
              |  SELECT doc_id, token, COUNT(*) AS tf FROM (
              |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
              |  ) t GROUP BY 1, 2
              |), dfreq AS (
              |  SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
              |), n AS (SELECT COUNT(*) AS n_docs FROM documents)
              |SELECT tf.doc_id, tf.token, tf.tf,
              |       ${Sql.rnd("tf.tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))", 6)} AS tf_idf
              |FROM tf JOIN dfreq ON tf.token = dfreq.token CROSS JOIN n""".stripMargin)),

    // ── EXT4 — corpus term frequencies.
    QueryDef(
      "ext4_term_freq",
      (s, d) => TextOps.termFrequencies(Tables.documents(s, d)),
      Some("""SELECT token, COUNT(*) AS cnt FROM (
             |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
             |) t GROUP BY 1""".stripMargin),
      bench = true),

    // ── EXT4b — token counting (whitespace + alpha-run regex).
    QueryDef(
      "ext4_token_count",
      (s, d) => TextOps.tokenCounts(Tables.documents(s, d)),
      Some("""SELECT doc_id,
             |       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
             |       CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS alpha_tokens
             |FROM documents""".stripMargin)),

    // ── EXT4c — quality scoring (length stats, stopword ratio).
    QueryDef(
      "ext4_quality",
      (s, d) => TextOps.qualityScore(Tables.documents(s, d)),
      Some(s"""SELECT doc_id,
              |       CAST(length(text) AS BIGINT) AS n_chars,
              |       CAST(len(t) AS BIGINT) AS n_tokens,
              |       ${Sql.rnd("CAST(length(text) - (len(t) - 1) AS DOUBLE) / len(t)", 4)} AS avg_token_len,
              |       ${Sql.rnd("CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(t)", 4)} AS stopword_ratio
              |FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents) d""".stripMargin)),

    // ── EXT4d — rolling polynomial fingerprint (portable arithmetic, no
    //    engine hash functions).
    QueryDef(
      "ext4_fingerprint",
      (s, d) => TextOps.fingerprint(Tables.documents(s, d)),
      Some("""SELECT doc_id,
             |       list_reduce(
             |         list_prepend(CAST(0 AS BIGINT),
             |           list_transform(string_split(text, ' '),
             |                          x -> CAST(ascii(x) * 131 + length(x) AS BIGINT))),
             |         (acc, v) -> (acc * 31 + v) % 1000000007) AS fingerprint
             |FROM documents""".stripMargin)),

    // ── EXT4e — language-ID marker scoring (argmax with lexicographic
    //    tie-break; see TextOps.LangMarkers on why fixture accuracy is nil).
    QueryDef(
      "ext4_langid",
      (s, d) => TextOps.languageId(Tables.documents(s, d)),
      Some("""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
             |scores AS (
             |  SELECT doc_id, lang AS labeled_lang, s.lng AS cand,
             |         CAST(len(list_filter(toks, x -> list_contains(s.markers, x))) AS BIGINT) AS hits
             |  FROM t CROSS JOIN (
             |    SELECT * FROM (VALUES
             |      ('de', ['der','die','und','nicht','das']),
             |      ('en', ['the','a','of','and','to','in','is']),
             |      ('es', ['el','la','y','que','de']),
             |      ('fr', ['le','la','et','les','des']),
             |      ('zh', ['de','le','shi','bu','zai'])) AS v(lng, markers)) s
             |), ranked AS (
             |  SELECT doc_id, labeled_lang, cand, hits,
             |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand) AS rk
             |  FROM scores
             |)
             |SELECT doc_id, labeled_lang, cand AS predicted_lang, hits AS marker_hits
             |FROM ranked WHERE rk = 1""".stripMargin)),

    // ── EXT4h — Gopher-style repetition signals (most-frequent-2-gram
    //    share, duplicated-5-gram coverage, distinct-token collapse).
    //    The oracle rebuilds the n-grams positionally in SQL; coverage
    //    counts DISTINCT covered positions, so overlapping duplicated
    //    5-grams never double-count.
    QueryDef(
      "ext4_repetition",
      (s, d) => TextOps.repetitionSignals(Tables.documents(s, d)),
      Some(s"""WITH base AS (
              |  SELECT doc_id, string_split(text, ' ') AS ws,
              |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
              |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS nd
              |  FROM documents
              |), g2 AS (
              |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
              |  FROM base, unnest(range(1, CAST(n AS BIGINT))) AS t(i)
              |), top2 AS (
              |  SELECT doc_id, MAX(c) AS top2
              |  FROM (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1
              |), g5 AS (
              |  SELECT doc_id, i AS p,
              |         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS g
              |  FROM base, unnest(range(1, CAST(n - 3 AS BIGINT))) AS t(i)
              |), dup AS (
              |  SELECT doc_id, g
              |  FROM (SELECT doc_id, g, COUNT(*) AS c FROM g5 GROUP BY 1, 2) WHERE c > 1
              |), cov AS (
              |  SELECT doc_id, COUNT(DISTINCT cp) AS n_cov
              |  FROM (SELECT g5.doc_id, g5.p + o AS cp
              |        FROM g5 JOIN dup USING (doc_id, g), unnest(range(0, 5)) AS t(o))
              |  GROUP BY 1
              |)
              |SELECT b.doc_id, b.n AS n_tokens,
              |       ${Sql.rnd("1.0 - CAST(nd AS DOUBLE) / CAST(n AS DOUBLE)", 4)} AS repetition_ratio,
              |       ${Sql.rnd("CAST(COALESCE(top2, 0) AS DOUBLE) / CAST(GREATEST(n - 1, 1) AS DOUBLE)", 4)} AS frac_top2gram,
              |       ${Sql.rnd("CAST(COALESCE(n_cov, 0) AS DOUBLE) / CAST(n AS DOUBLE)", 4)} AS frac_dup5gram
              |FROM base b
              |LEFT JOIN top2 USING (doc_id)
              |LEFT JOIN cov USING (doc_id)""".stripMargin)),

    // ── EXT5 — JSON column extraction (events.props).
    QueryDef(
      "ext5_json_extract",
      (s, d) =>
        Tables.events(s, d).select(
          col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k LONG")).getField("k").as("k")),
      Some("""SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
             |FROM events""".stripMargin)),

    // ── EXT5b — multimodal metadata features over the opaque payload
    //    (decode itself is the documented stub; see ops/Multimodal.scala).
    QueryDef(
      "ext5_media_meta",
      (s, d) => {
        val m = Multimodal.mediaFromDocuments(s, Tables.documents(s, d)).toDF()
        m.select(col("media_id") +: col("kind") +: Multimodal.metaColumns(col("payload")): _*)
      },
      Some("""SELECT doc_id AS media_id, 'img/' || source AS kind,
             |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |       CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
             |       CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) AS height,
             |       CAST(octet_length(encode(text)) // 1000 + 1 AS BIGINT) AS n_frames
             |FROM documents""".stripMargin)),

    // ── EXT5c — resize to a fixed target: the oracle checks the output
    //    CONTRACT (every row leaves 32×32 with exactly 1024 payload
    //    bytes — what a vision encoder consumes); the nearest-neighbor
    //    byte content is pinned in StreamingMultimodalSpec.
    QueryDef(
      "ext5_media_resize",
      (s, d) =>
        Multimodal.resize(Multimodal.mediaFromDocuments(s, Tables.documents(s, d))).toDF()
          .select(col("media_id"), col("kind"), col("width"), col("height"),
            length(col("payload")).cast("long").as("n_bytes")),
      Some("""SELECT doc_id AS media_id, 'img/' || source AS kind,
             |       CAST(32 AS BIGINT) AS width, CAST(32 AS BIGINT) AS height,
             |       CAST(1024 AS BIGINT) AS n_bytes
             |FROM documents""".stripMargin)),

    // ── EXT5d — perceptual media signatures (dHash over the stub's
    //    resampled "luminance plane"; ops/Multimodal.perceptualHash).
    //    Pure integer/ascii arithmetic ⇒ the oracle replays the exact
    //    64-bit fingerprints.
    QueryDef(
      "ext5_media_phash",
      (s, d) => Multimodal.perceptualHash(Tables.documents(s, d)),
      Some(PhashCte + "SELECT media_id, phash FROM ph")),

    // ── EXT5d-pairs — perceptual near-dup for media: banded-bucket
    //    hamming join over the dHash signatures (never all-pairs; shares
    //    Dedup.bandedHammingPairs with SimHash). Runs over the corpus
    //    plus planted re-encoded copies (see [[PlantedCopiesSql]] — the
    //    raw fixture has no perceptual dups, and a 0-row green verifies
    //    nothing). Oracle = brute-force hamming over replayed
    //    signatures — green ⇔ the pigeonhole band join achieved exact
    //    recall+precision; the quadratic side lives in the ORACLE only.
    QueryDef(
      "ext5_media_neardup",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val planted = docs.union(
          docs.filter(col("doc_id") % 97 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        Multimodal.mediaNearDup(planted)
      },
      Some(phashCte("planted", PlantedCopiesSql) +
        """SELECT a.media_id AS media_a, b.media_id AS media_b,
          |       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
          |FROM ph a JOIN ph b ON a.media_id < b.media_id
          |WHERE bit_count(xor(a.phash, b.phash)) <= 3""".stripMargin)),

    // ── EXT7 — the composed training-data cleaning pipeline: quality
    //    gate → exact dedup → near-dup dedup (LSH) → survivors. The
    //    oracle recomputes the near-dup losers from the exact all-pairs
    //    ground truth, so green additionally re-proves LSH recall inside
    //    a composition.
    QueryDef(
      "ext7_clean_corpus",
      (s, d) => graft.ops.CorpusClean.clean(Tables.documents(s, d)),
      Some(CleanCorpusCtes +
        """SELECT e.doc_id, q.n_chars, q.n_tokens, q.stopword_ratio
          |FROM exact e
          |JOIN quality q ON e.doc_id = q.doc_id
          |WHERE e.doc_id NOT IN (SELECT doc_b FROM jac WHERE jaccard >= 0.5)""".stripMargin),
      bench = true),

    // ── EXT2e — connected components over the near-dup pair graph
    //    (doc_a, doc_b from the exact Jaccard ground truth): the dedup
    //    clustering step. Oracle: DuckDB transitive closure via a
    //    recursive CTE, component = MIN reachable id — an independent
    //    algorithm (closure + group-by vs label propagation), so green
    //    proves the clustering itself, not the implementation.
    QueryDef(
      "ext2_components",
      (s, d) => Dedup.connectedComponents(Dedup.jaccardPairs(Tables.documents(s, d))),
      Some(DocShinglesCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, edges AS (
          |  SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.5
          |  UNION ALL
          |  SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.5
          |), reach(doc_id, r) AS (
          |  SELECT src, src FROM edges
          |  UNION
          |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id
          |)
          |SELECT doc_id, MIN(r) AS component FROM reach GROUP BY 1""".stripMargin)),

    // ── EXT7b — cleaning with exact near-dup CLUSTERING: one survivor
    //    (the min id) per connected component instead of the greedy
    //    pairwise drop, which over-removes on transitive chains.
    QueryDef(
      "ext7_clean_clustered",
      (s, d) => graft.ops.CorpusClean.cleanClustered(Tables.documents(s, d)),
      Some(CleanCorpusCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, edges AS (
          |  SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.5
          |  UNION ALL
          |  SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.5
          |), reach(doc_id, r) AS (
          |  SELECT src, src FROM edges
          |  UNION
          |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id
          |), comp AS (
          |  SELECT doc_id, MIN(r) AS component FROM reach GROUP BY 1
          |)
          |SELECT e.doc_id, q.n_chars, q.n_tokens, q.stopword_ratio
          |FROM exact e
          |JOIN quality q ON e.doc_id = q.doc_id
          |WHERE e.doc_id NOT IN (SELECT doc_id FROM comp WHERE component <> doc_id)""".stripMargin),
      bench = true),

    // ── EXT19 — the composed ASSEMBLY pipeline: quality gate → exact
    //    dedup → LSH near-dup clustering → survivors → deterministic
    //    train/val/test split → per-split corpus stats. One query runs
    //    the whole training-data path, and the oracle recomputes every
    //    stage from first principles (recursive-CTE transitive closure
    //    for the clustering; modulo cut-points for the split) — the
    //    end-to-end version of the per-stage gates.
    QueryDef(
      "ext19_assembly",
      (s, d) =>
        Sampling.hashSplit(
            graft.ops.CorpusClean.cleanClustered(Tables.documents(s, d)),
            col("doc_id"),
            Seq(("train", 80), ("val", 10), ("test", 10)), Sampling.modBucket)
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens")),
      Some(CleanCorpusCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, edges AS (
          |  SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.5
          |  UNION ALL
          |  SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.5
          |), reach(doc_id, r) AS (
          |  SELECT src, src FROM edges
          |  UNION
          |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id
          |), comp AS (
          |  SELECT doc_id, MIN(r) AS component FROM reach GROUP BY 1
          |)
          |SELECT CASE WHEN e.doc_id % 100 < 80 THEN 'train'
          |            WHEN e.doc_id % 100 < 90 THEN 'val'
          |            ELSE 'test' END AS split,
          |       COUNT(*) AS n_docs,
          |       CAST(SUM(q.n_tokens) AS BIGINT) AS sum_tokens
          |FROM exact e
          |JOIN quality q ON e.doc_id = q.doc_id
          |WHERE e.doc_id NOT IN (SELECT doc_id FROM comp WHERE component <> doc_id)
          |GROUP BY 1""".stripMargin),
      bench = true),

    // ── EXT20 — benchmark decontamination: the documents table split
    //    into a train corpus (doc_id % 5 ≠ 0) and an eval corpus
    //    (doc_id % 5 = 0); report the (eval, train) pairs whose 3-gram
    //    CONTAINMENT of the eval doc reaches 0.5. The oracle recomputes
    //    the exact shingle intersection over the same two-way split.
    //    The hot-shingle guard runs ENGAGED (the production shape — a
    //    boilerplate shingle must never fan the join out ×df): the cap
    //    sits above the fixtures' max train doc-frequency (21 at sf0.1,
    //    ~same per ScaleUp replica at sf1 — word permutation keeps
    //    shingles replica-local), so it drops nothing here and the
    //    exact-intersection oracle still hash-matches; the binding case
    //    is the planted-boilerplate test in DedupSimilaritySpec.
    QueryDef(
      "ext20_decontam",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.decontamPairs(
          docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0),
          maxTrainDf = DecontamTrainDfCap)
      },
      Some(DecontamCtes +
        s"""SELECT eval_doc, train_doc, ${Sql.rnd("overlap", 4)} AS overlap
           |FROM ov WHERE overlap >= 0.5""".stripMargin),
      bench = true),

    // ── EXT45 — Bloom-prefiltered decontamination: ext20's semantics
    //    through the broadcast-Bloom train-side prefilter (the eval
    //    shingle set compressed to 2¹⁸ bits, every train shingle probed
    //    with pure built-in Column arithmetic BEFORE the shuffle — at
    //    lake scale only the eval-overlapping sliver of the train
    //    shingle projection crosses the wire). The oracle is the SAME
    //    exact-intersection SQL as ext20: the lane hash-matching it IS
    //    the no-false-negative law, cross-engine — the filter may only
    //    pass extra shingles (which then find no equi-join partner),
    //    never drop a shared one. Prefilter selectivity + planted
    //    disjoint-corpus behavior are pinned in DedupSimilaritySpec.
    QueryDef(
      "ext45_bloom_decontam",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.decontamPairsBloom(
          docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0),
          maxTrainDf = DecontamTrainDfCap, numBits = 1 << 18, numHashes = 5)
      },
      Some(DecontamCtes +
        s"""SELECT eval_doc, train_doc, ${Sql.rnd("overlap", 4)} AS overlap
           |FROM ov WHERE overlap >= 0.5""".stripMargin),
      bench = true),

    // ── EXT49 — n-gram novelty vs the reference corpus: the decontam
    //    split re-read as a MIXING question — what fraction of each
    //    eval doc's distinct 3-grams appears nowhere in train. No
    //    per-pair join: the reference collapses to its distinct global
    //    shingle set and eval semi-joins it once.
    QueryDef(
      "ext49_novelty",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.noveltyScores(
          docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0))
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
              |), shing AS (
              |  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
              |                                FOR i IN range(1, len(t) - 1)]) AS sh
              |  FROM toks WHERE len(t) >= 3
              |), inv AS (
              |  SELECT doc_id, unnest(sh) AS shingle FROM shing
              |), refset AS (
              |  SELECT DISTINCT shingle FROM inv WHERE doc_id % 5 <> 0
              |), ev AS (
              |  SELECT doc_id, shingle, shingle IN (SELECT shingle FROM refset) AS seen
              |  FROM inv WHERE doc_id % 5 = 0
              |)
              |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
              |       CAST(SUM(CASE WHEN seen THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
              |       ${Sql.rnd(
                 "CAST(COUNT(*) - SUM(CASE WHEN seen THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)", 4)}
              |         AS novelty
              |FROM ev GROUP BY doc_id""".stripMargin),
      bench = true),

    // ── EXT20b — the per-eval-doc contamination report (how many train
    //    docs leak each eval doc, and the worst overlap).
    QueryDef(
      "ext20_decontam_report",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.decontamReport(
          docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0),
          maxTrainDf = DecontamTrainDfCap)
      },
      Some(DecontamCtes +
        s"""SELECT eval_doc, COUNT(*) AS n_train_docs,
           |       MAX(${Sql.rnd("overlap", 4)}) AS max_overlap
           |FROM ov WHERE overlap >= 0.5 GROUP BY 1""".stripMargin)),

    // ── EXT24 — keyed table diff (migration validation). Left = the %2
    //    slice, right = the %3 slice with user_id shifted on %4 keys, so
    //    every class is exercised: left-only → removed, right-only →
    //    added, overlap (%6) split into changed (%4, the shifted rows)
    //    and unchanged. The oracle derives the classification
    //    analytically from the same modular structure.
    QueryDef(
      "ext24_table_diff",
      (s, d) => {
        val ev = Tables.events(s, d)
        val before = ev.filter(col("event_id") % 2 === 0)
        val after = ev.filter(col("event_id") % 3 === 0)
          .withColumn(
            "user_id",
            when(col("event_id") % 4 === 0, col("user_id") + 1000000000L)
              .otherwise(col("user_id")))
        Diff.diffTables(before, after, keys = Seq("event_id"))
      },
      Some("""SELECT event_id,
             |       CASE WHEN event_id % 3 <> 0 THEN 'removed'
             |            WHEN event_id % 2 <> 0 THEN 'added'
             |            WHEN event_id % 4 = 0 THEN 'changed'
             |            ELSE 'unchanged' END AS change
             |FROM events
             |WHERE event_id % 2 = 0 OR event_id % 3 = 0""".stripMargin)),

    // ── EXT6b — session-level rollup (the session_sources table the
    //    reference assumes pre-exists, derived from raw events).
    QueryDef(
      "ext6_session_sources",
      (s, d) =>
        Sessionize.sessionSources(Tables.events(s, d))
          .select(col("user_id"), col("session_num"), col("entry_channel"),
            col("n_events"), col("total_value")),
      Some(s"""WITH sess AS (
              |  SELECT event_id, user_id, ts, event_type, value,
              |         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_num
              |  FROM (
              |    SELECT *, CASE WHEN prev_ts IS NULL
              |                        OR epoch_ns(ts) - epoch_ns(prev_ts) > CAST(1800000000000 AS BIGINT) THEN 1
              |                   ELSE 0 END AS new_session
              |    FROM (SELECT event_id, user_id, ts, event_type, value,
              |                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              |          FROM events) l) f
              |)
              |, sess2 AS (
              |  SELECT *, FIRST_VALUE(event_type) OVER (PARTITION BY user_id, session_num
              |                                          ORDER BY ts, event_id) AS entry_channel
              |  FROM sess
              |)
              |SELECT user_id, session_num, entry_channel,
              |       COUNT(*) AS n_events,
              |       ${Sql.rnd("SUM(value)", 2)} AS total_value
              |FROM sess2 GROUP BY 1, 2, 3""".stripMargin)),

    // ── EXT6 — gap-based sessionization of raw events.
    QueryDef(
      "ext6_sessionize",
      (s, d) => Sessionize.sessions(Tables.events(s, d)),
      Some("""SELECT event_id, user_id,
             |       CAST(SUM(new_session) OVER (PARTITION BY user_id
             |                                   ORDER BY ts, event_id
             |                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_num
             |FROM (
             |  SELECT event_id, user_id, ts,
             |         CASE WHEN prev_ts IS NULL
             |                   OR epoch_ns(ts) - epoch_ns(prev_ts) > CAST(1800000000000 AS BIGINT) THEN 1
             |              ELSE 0 END AS new_session
             |  FROM (
             |    SELECT event_id, user_id, ts,
             |           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |    FROM events) l) f""".stripMargin),
      bench = true),

    // ── EXT4f — token redaction/masking: the regexp_replace scrub every
    //    pre-training pipeline runs (PII patterns, boilerplate, banned
    //    vocab). The fixture corpus has no digits/emails, so the masked
    //    class here is the determiner tokens — same mechanism, observable
    //    effect. Word-boundary alternation stays in the Java-regex/RE2
    //    common subset; DuckDB needs the explicit 'g' flag for the
    //    global replace Spark does by default.
    QueryDef(
      "ext4_redact",
      (s, d) =>
        Tables.documents(s, d).select(
          col("doc_id"),
          regexp_replace(col("text"), "\\ba\\b|\\bthe\\b", "<mask>").as("masked"),
          // pattern as a lit() Column, NOT inside expr(): a SQL string
          // literal treats \b as a backspace ESCAPE, silently turning
          // the word-boundary regex into a never-matching literal
          size(regexp_extract_all(col("text"), lit("\\ba\\b|\\bthe\\b"), lit(0)))
            .cast("long").as("n_masked")),
      Some("""SELECT doc_id,
             |       regexp_replace(text, '\ba\b|\bthe\b', '<mask>', 'g') AS masked,
             |       len(regexp_extract_all(text, '\ba\b|\bthe\b', 0)) AS n_masked
             |FROM documents""".stripMargin)),

    // ── EXT17a — deterministic train/val/test split. The op's default
    //    bucketer is xxhash64 (pinned by fraction/determinism tests in
    //    StorageSkewSpec); the oracle twin runs the portable `doc_id %
    //    100` bucketer so both engines compute identical membership —
    //    what the hash gate then proves is the split SEMANTICS:
    //    cumulative cut-points, disjoint, exhaustive.
    QueryDef(
      "ext17_split",
      (s, d) =>
        Sampling.hashSplit(
            Tables.documents(s, d), col("doc_id"),
            Seq(("train", 80), ("val", 10), ("test", 10)), Sampling.modBucket)
          .groupBy("split", "lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars")),
      Some("""SELECT CASE WHEN doc_id % 100 < 80 THEN 'train'
             |            WHEN doc_id % 100 < 90 THEN 'val'
             |            ELSE 'test' END AS split,
             |       lang, COUNT(*) AS n_docs,
             |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             |FROM documents GROUP BY 1, 2""".stripMargin)),

    // ── EXT17b — corpus mixture weighting: deterministic per-source
    //    downsampling ("2 parts src0, 1 part src1, a pinch of the rest").
    QueryDef(
      "ext17_mixture",
      (s, d) =>
        Sampling.sampleByRates(
            Tables.documents(s, d), col("source"),
            Map("src0" -> 100, "src1" -> 50, "src2" -> 25), col("doc_id"),
            defaultRate = 10, bucketFn = Sampling.modBucket)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars")),
      Some("""SELECT source, COUNT(*) AS n_docs,
             |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             |FROM documents
             |WHERE doc_id % 100 < CASE source WHEN 'src0' THEN 100
             |                                 WHEN 'src1' THEN 50
             |                                 WHEN 'src2' THEN 25 ELSE 10 END
             |GROUP BY 1""".stripMargin)),

    // ── EXT17d — temperature-flattened mixing (p_i ∝ √n_i under a row
    //    budget): the oracle recomputes the per-source rates from the
    //    same integer discipline — ⌊IEEE-sqrt⌋ then HUGEINT floor
    //    division, bit-identical to the Scala BigInt path — and applies
    //    the same modulo membership, so the WHOLE decision (rates +
    //    membership) sits under the hash gate, not just the filter.
    QueryDef(
      "ext17_temperature",
      (s, d) =>
        Sampling.temperatureMixture(
            Tables.documents(s, d), col("source"), col("doc_id"),
            targetRows = 300L, bucketFn = Sampling.modBucket)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars")),
      Some("""WITH counts AS (
             |  SELECT source, COUNT(*) AS n FROM documents GROUP BY 1
             |), w AS (
             |  SELECT source, n, CAST(FLOOR(SQRT(n)) AS BIGINT) AS q FROM counts
             |), tot AS (
             |  SELECT SUM(q) AS s FROM w
             |), rates AS (
             |  SELECT source,
             |         LEAST(CAST(100 AS HUGEINT),
             |               (CAST(100 AS HUGEINT) * 300 * q) // (s * n)) AS rate
             |  FROM w, tot
             |)
             |SELECT d.source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             |FROM documents d JOIN rates r ON d.source = r.source
             |WHERE d.doc_id % 100 < r.rate
             |GROUP BY 1""".stripMargin)),

    // ── EXT17c — exact-quota stratified sampling: 20% of EVERY language,
    //    guaranteed per stratum (bucket sampling only hits fractions in
    //    expectation — a rare language could come back empty). Ordered by
    //    doc_id, so membership is the same on both engines.
    QueryDef(
      "ext17_stratified",
      (s, d) =>
        Sampling.stratifiedHead(
            Tables.documents(s, d), col("lang"), col("doc_id"), percent = 20)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("sum_chars")),
      Some("""SELECT lang, COUNT(*) AS n_kept,
             |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             |FROM (SELECT lang, n_chars,
             |             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
             |             COUNT(*) OVER (PARTITION BY lang) AS n
             |      FROM documents) t
             |WHERE rn <= CEIL(n * 20 / 100.0)
             |GROUP BY 1""".stripMargin)),

    // ── EXT18 — one-pass column profiling over the sessions⟕costs frame
    //    (cost is genuinely nullable: every 4th session has no cost row).
    //    Typed min/max lanes: numerics stay DOUBLE, strings stay VARCHAR —
    //    a shared stringified column would drag engine float-formatting
    //    into the hash.
    QueryDef(
      "ext18_profile",
      (s, d) =>
        Profiling.profile(
          Tables.sessions(s, d)
            .join(Tables.sessionCosts(s, d), Seq("session_id"), "left"),
          numCols = Seq("session_id", "user_id", "cost"),
          strCols = Seq("channel_name")),
      Some {
        val frame =
          """(SELECT s.session_id, s.user_id, s.channel_name, c.cost
            |   FROM sessions s LEFT JOIN session_costs c USING (session_id)) j""".stripMargin
        def numRow(c: String) =
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
             |       CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |       COUNT(DISTINCT $c) AS n_distinct,
             |       CAST(MIN($c) AS DOUBLE) AS min_num, CAST(MAX($c) AS DOUBLE) AS max_num,
             |       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
             |FROM $frame""".stripMargin
        def strRow(c: String) =
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
             |       CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |       COUNT(DISTINCT $c) AS n_distinct,
             |       CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
             |       MIN($c) AS min_str, MAX($c) AS max_str
             |FROM $frame""".stripMargin
        Sql.CTES +
          Seq(numRow("session_id"), numRow("user_id"), numRow("cost"),
            strRow("channel_name")).mkString("\nUNION ALL\n")
      }),

    // ── EXT25a — training-sequence packing, per-shard plan: documents
    //    hash-sharded, concatenated in doc_id order with a one-token EOS,
    //    cut into 512-token blocks. The summary is what a shard writer
    //    needs before writing a single byte: block counts, tail padding,
    //    fill ratio. Whole-number `div` arithmetic on both engines.
    QueryDef(
      "ext25_pack",
      (s, d) =>
        Packing.packSummary(
          Tables.documents(s, d), "doc_id",
          size(TextOps.tokens(col("text"))), blockLen = 512L, nShards = 8),
      Some(s"""WITH t AS (
              |  SELECT doc_id, doc_id % 8 AS shard,
              |         CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS n_tok
              |  FROM documents
              |)
              |SELECT CAST(shard AS BIGINT) AS shard, COUNT(*) AS n_docs,
              |       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
              |       CAST((CAST(SUM(n_tok) AS BIGINT) + 511) // 512 AS BIGINT) AS n_blocks,
              |       CAST(((CAST(SUM(n_tok) AS BIGINT) + 511) // 512) * 512
              |            - CAST(SUM(n_tok) AS BIGINT) AS BIGINT) AS pad_tokens,
              |       ${Sql.rnd(
                 "CAST(SUM(n_tok) AS DOUBLE) / (((CAST(SUM(n_tok) AS BIGINT) + 511) // 512) * 512)",
                 4)} AS fill_ratio
              |FROM t GROUP BY 1""".stripMargin),
      bench = true),

    // ── EXT25b — the per-document block spans under the same plan: which
    //    blocks each document lands in (first, last, span width) from the
    //    per-shard running token total. The per-shard cumulative window is
    //    keyed by the shard column — shard count = parallelism, no global
    //    window anywhere (cf. Chunking's scaladoc).
    QueryDef(
      "ext25_pack_spans",
      (s, d) =>
        Packing.packSpans(
          Tables.documents(s, d), "doc_id",
          size(TextOps.tokens(col("text"))), blockLen = 512L, nShards = 8),
      Some("""WITH t AS (
             |  SELECT doc_id, doc_id % 8 AS shard,
             |         CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS n_tok
             |  FROM documents
             |), c AS (
             |  SELECT doc_id, shard, n_tok,
             |         SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
             |                          ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM t
             |)
             |SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tok,
             |       CAST((cum - n_tok) // 512 AS BIGINT) AS block_first,
             |       CAST((cum - 1) // 512 AS BIGINT) AS block_last,
             |       CAST((cum - 1) // 512 - (cum - n_tok) // 512 + 1 AS BIGINT) AS n_blocks
             |FROM c""".stripMargin)),

    // ── EXT26 — size-balanced shard layout: rank by n_chars DESC (two-pass
    //    distributed rank, no single-partition window) and serpentine-deal
    //    across 8 shards — sorted round-robin LPT. The oracle reproduces
    //    the exact rank arithmetic; the per-shard totals land within one
    //    round's size spread of each other (asserted in PackingSpec).
    QueryDef(
      "ext26_shards",
      (s, d) =>
        Packing.balancedShards(Tables.documents(s, d), "n_chars", "doc_id", nShards = 8)
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars")),
      Some("""WITH r AS (
             |  SELECT doc_id, n_chars,
             |         ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS r0
             |  FROM documents
             |)
             |SELECT CAST(CASE WHEN (r0 // 8) % 2 = 0 THEN r0 % 8
             |            ELSE 7 - (r0 % 8) END AS BIGINT) AS shard,
             |       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
             |FROM r GROUP BY 1""".stripMargin)),

    // ── EXT27 — cross-document duplication audit: per document, the
    //    fraction of its distinct 3-grams occurring in ≥2 documents. The
    //    df join is a 1:1 enrich (d rows for a gram shared by d docs, not
    //    d² pairs) — the corpus-dup signal that stays linear at lake scale
    //    where all-pairs Jaccard (ext2a) cannot.
    QueryDef(
      "ext27_dup_audit",
      (s, d) => TextOps.sharedGramAudit(Tables.documents(s, d)),
      Some(s"""WITH toks AS (
              |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
              |), shing AS (
              |  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
              |                                FOR i IN range(1, len(t) - 1)]) AS sh
              |  FROM toks WHERE len(t) >= 3
              |), inv AS (
              |  SELECT doc_id, unnest(sh) AS shingle FROM shing
              |), dfreq AS (
              |  SELECT shingle, COUNT(*) AS df FROM inv GROUP BY 1
              |)
              |SELECT i.doc_id, COUNT(*) AS n_shingles,
              |       CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
              |       ${Sql.rnd(
                 "CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)",
                 4)} AS shared_frac
              |FROM inv i JOIN dfreq d USING (shingle)
              |GROUP BY 1""".stripMargin),
      bench = true),

    // ── EXT28 — pairwise source-overlap matrix (ops/Curation
    //    .sourceOverlap): distinct (source, shingle) inverted index →
    //    shingle-keyed self-join (fan-out bounded by |sources|² per
    //    vocabulary entry, never per doc pair) → per-pair Jaccard. The
    //    curation question behind mixture weights and dedup order:
    //    how much of source B is already in source A?
    QueryDef(
      "ext28_source_overlap",
      (s, d) => Curation.sourceOverlap(Tables.documents(s, d)),
      Some(s"""WITH toks AS (
              |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
              |), shing AS (
              |  SELECT source, [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
              |                  FOR i IN range(1, len(t) - 1)] AS sh
              |  FROM toks WHERE len(t) >= 3
              |), inv AS (
              |  SELECT DISTINCT source, shingle
              |  FROM (SELECT source, unnest(sh) AS shingle FROM shing)
              |), per AS (
              |  SELECT source, COUNT(*) AS n FROM inv GROUP BY 1
              |), pairs AS (
              |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
              |  FROM inv a JOIN inv b USING (shingle)
              |  WHERE a.source < b.source GROUP BY 1, 2
              |)
              |SELECT src_a, src_b, pa.n AS n_a, pb.n AS n_b, inter,
              |       ${Sql.rnd(
                 "CAST(inter AS DOUBLE) / CAST(pa.n + pb.n - inter AS DOUBLE)", 4)} AS jaccard
              |FROM pairs JOIN per pa ON pa.source = src_a
              |           JOIN per pb ON pb.source = src_b""".stripMargin),
      bench = true),

    // ── EXT29 — token-budget truncation (ops/Curation.truncateToBudget):
    //    context-window capping just before sequence packing. Pure
    //    per-row codegen'd expressions; the before/after counts report
    //    how much text the cap discarded.
    QueryDef(
      "ext29_truncate",
      (s, d) => Curation.truncateToBudget(Tables.documents(s, d), maxTokens = 24),
      Some("""SELECT doc_id,
             |       CAST(len(t) AS BIGINT) AS n_tokens,
             |       CAST(LEAST(len(t), 24) AS BIGINT) AS kept_tokens,
             |       array_to_string(t[1:24], ' ') AS text_trunc
             |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)""".stripMargin)),

    // ── EXT30 — deterministic seeded shuffle (ops/Curation
    //    .seededShuffle): reproducible (shard, pos) training order from a
    //    portable modular hash — the oracle replays the exact permutation
    //    from (doc_id, seed) alone, proving any engine can audit the
    //    epoch order. The seed keys the MULTIPLIER (m = (seed·2654435761)
    //    mod (p−1) + 1), so different seeds permute within-shard order
    //    rather than relabeling shards. pos ranks WITHIN shards (parallel
    //    windows, no global sort).
    QueryDef(
      "ext30_shuffle",
      (s, d) => Curation.seededShuffle(Tables.documents(s, d), seed = 42L, shards = 8),
      Some("""WITH h AS (
             |  SELECT doc_id,
             |         ((doc_id % 1000000007)
             |            * ((42 * 2654435761) % 1000000006 + 1)
             |          + 42) % 1000000007 AS h
             |  FROM documents
             |)
             |SELECT doc_id, h % 8 AS shard,
             |       CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
             |            AS BIGINT) AS pos
             |FROM h""".stripMargin)),

    // ── EXT33a — exact-substring duplicate spans (ops/SpanDedup): the
    //    position-level dedup of Lee et al. 2022's ExactSubstr, as a
    //    distributed gram inverted index instead of a suffix array. The
    //    oracle replays the whole semantics in SQL — gram occurrences by
    //    list slicing, first-occurrence election, gaps-and-islands span
    //    merge — so green means the combinable-aggregate engine path
    //    produces exactly the rank-window reference spans.
    QueryDef(
      "ext33_dup_spans",
      (s, d) => SpanDedup.duplicatedSpans(Tables.documents(s, d), L = 5),
      bench = true,
      sql = Some(spanMarkCte(5) +
        """, isl AS (
          |  SELECT doc_id, pos,
          |         CASE WHEN pos > COALESCE(MAX(pos + 4) OVER (
          |                  PARTITION BY doc_id ORDER BY pos
          |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          |                -9223372036854775807 - 1) + 1
          |              THEN 1 ELSE 0 END AS brk
          |  FROM marked
          |), isl2 AS (
          |  SELECT doc_id, pos,
          |         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
          |  FROM isl
          |)
          |SELECT doc_id,
          |       CAST(MIN(pos) AS BIGINT) AS span_start,
          |       CAST(MAX(pos) + 4 AS BIGINT) AS span_end,
          |       CAST(MAX(pos) + 4 - MIN(pos) + 1 AS BIGINT) AS span_tokens
          |FROM isl2 GROUP BY doc_id, island""".stripMargin)),

    // ── EXT33b — exact-substring trim: rebuild every document with the
    //    redundant positions removed (each duplicated gram keeps exactly
    //    its first corpus occurrence in (doc_id, pos) order). The green
    //    hash covers the reconstructed TEXT itself, not just counts.
    QueryDef(
      "ext33_trim",
      (s, d) => SpanDedup.trimSpans(Tables.documents(s, d), L = 5),
      Some(spanMarkCte(5) +
        """, covered AS (
          |  SELECT DISTINCT doc_id, CAST(unnest(range(pos, pos + 5)) AS BIGINT) AS pos
          |  FROM marked
          |), toks AS (
          |  SELECT doc_id, CAST(g AS BIGINT) - 1 AS pos, l[g] AS tok
          |  FROM (SELECT doc_id, unnest(range(1, len(l) + 1)) AS g, l FROM d)
          |), kept AS (
          |  SELECT t.doc_id, t.pos, t.tok
          |  FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
          |  WHERE c.doc_id IS NULL
          |), agg AS (
          |  SELECT doc_id, COUNT(*) AS kept_tokens,
          |         string_agg(tok, ' ' ORDER BY pos) AS text_clean
          |  FROM kept GROUP BY doc_id
          |)
          |SELECT d2.doc_id,
          |       CAST(len(string_split(d2.text, ' ')) AS BIGINT) AS n_tokens,
          |       CAST(COALESCE(agg.kept_tokens, 0) AS BIGINT) AS kept_tokens,
          |       COALESCE(agg.text_clean, '') AS text_clean
          |FROM documents d2 LEFT JOIN agg USING (doc_id)""".stripMargin)),

    // ── EXT2d-lsh — embedding near-dup pairs via banded sign-LSH: the
    //    100×-scale path (candidates bounded by collision probability,
    //    tables·C(n,2)/2^planes) where the trained-IVF variant is
    //    per-cell quadratic and DNF'd the sf10 century. Same planted
    //    corpus and EXACT all-pairs oracle as ext2_embed_neardup_ivf:
    //    green ⇔ sign-LSH achieved exact recall AND precision here
    //    (exact duplicates collide in every table — structural, not
    //    probabilistic).
    QueryDef(
      "ext2_embed_neardup_lsh",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val planted = e.filter(col("vec_id") % 10 === 0)
          .withColumn("vec_id", col("vec_id") + lit(10000000L))
        Similarity.nearDupPairsLsh(e.unionByName(planted))
      },
      Some(s"""WITH pe AS (
              |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
              |  UNION ALL
              |  SELECT vec_id + 10000000, CAST(embedding AS DOUBLE[]) AS emb
              |  FROM embeddings WHERE vec_id % 10 = 0
              |), e AS (
              |  SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM pe
              |)
              |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              |       ${Sql.rnd("list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm)", 6)} AS sim
              |FROM e a JOIN e b ON a.vec_id < b.vec_id
              |WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) >= 0.95""".stripMargin)),

    // ── EXT34 — SemDeDup-style semantic prune (Abbas et al. 2023):
    //    embedding near-dup pairs → greedy keep-lowest-id survivors. The
    //    pair source is the banded sign-LSH path (the configuration that
    //    survives the sf10 century; the IVF variant is per-cell
    //    quadratic there). Same planted-duplicate corpus as the pairs
    //    lanes — the fixture alone has no cosine-0.95 pairs, so every
    //    10th vector is re-inserted under vec_id + 10⁷ and the oracle
    //    prunes against the EXACT all-pairs ground truth: green ⇔ the
    //    LSH path found every pair the greedy rule needed.
    QueryDef(
      "ext34_semdedup",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val planted = e.filter(col("vec_id") % 10 === 0)
          .withColumn("vec_id", col("vec_id") + lit(10000000L))
        val corpus = e.unionByName(planted)
        val dropIds = Similarity.nearDupPairsLsh(corpus)
          .select(col("vec_b").as("vec_id")).distinct()
        corpus.join(dropIds, Seq("vec_id"), "left_anti").select("vec_id")
      },
      Some("""WITH pe AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
             |  UNION ALL
             |  SELECT vec_id + 10000000, CAST(embedding AS DOUBLE[]) AS emb
             |  FROM embeddings WHERE vec_id % 10 = 0
             |), e AS (
             |  SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM pe
             |), drop_ids AS (
             |  SELECT DISTINCT b.vec_id
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id
             |  WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) >= 0.95
             |)
             |SELECT vec_id FROM pe
             |WHERE vec_id NOT IN (SELECT vec_id FROM drop_ids)""".stripMargin)),

    // ── EXT34b — SemDeDup with CLUSTER survivors (the paper's proper
    //    semantics): one representative — the min id — per connected
    //    component of the near-dup graph, instead of the greedy
    //    drop-every-higher-pair-member rule, which over-removes on
    //    chains (edges a–c, b–c with no a–b edge: greedy keeps {a, b},
    //    clustering keeps {a} — one survivor per semantic group; the
    //    direction is pinned in DedupSimilaritySpec). Same planted
    //    corpus and sign-LSH pair source as ext34; the oracle is an
    //    INDEPENDENT algorithm (recursive-CTE transitive closure over
    //    the exact all-pairs graph, the ext7_clean_clustered pattern).
    QueryDef(
      "ext34_semdedup_clustered",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val planted = e.filter(col("vec_id") % 10 === 0)
          .withColumn("vec_id", col("vec_id") + lit(10000000L))
        val corpus = e.unionByName(planted)
        val pairs = Similarity.nearDupPairsLsh(corpus)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
        val dropIds = Dedup.connectedComponents(pairs)
          .filter(col("component") =!= col("doc_id"))
          .select(col("doc_id").as("vec_id"))
        corpus.join(dropIds, Seq("vec_id"), "left_anti").select("vec_id")
      },
      Some("""WITH RECURSIVE pe AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
             |  UNION ALL
             |  SELECT vec_id + 10000000, CAST(embedding AS DOUBLE[]) AS emb
             |  FROM embeddings WHERE vec_id % 10 = 0
             |), e AS (
             |  SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM pe
             |), edges AS (
             |  SELECT a.vec_id AS src, b.vec_id AS dst
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id
             |  WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) >= 0.95
             |  UNION ALL
             |  SELECT b.vec_id, a.vec_id
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id
             |  WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) >= 0.95
             |), reach(doc_id, r) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id
             |), comp AS (
             |  SELECT doc_id, MIN(r) AS component FROM reach GROUP BY 1
             |)
             |SELECT vec_id FROM pe
             |WHERE vec_id NOT IN (SELECT doc_id FROM comp WHERE component <> doc_id)""".stripMargin)),

    // ── EXT51 — BM25 full-text retrieval (Robertson & Walker 1994,
    //    Lucene-shape idf): top-5 documents per keyword query. The
    //    corpus is touched twice (tf groupBy + doc-length projection);
    //    a broadcast semi-restriction to the query vocabulary makes
    //    df/scoring/ranking posting-list-sized; N and avgdl are one
    //    scalar driver row re-entering as literals. avgdl is an AVG of
    //    BIGINTs (< 2^53 — order-independent exact sum), idf/termScore
    //    use the identical expression tree in both engines, and the
    //    only order-dependent float op — the Σ over ≤ 3 query terms —
    //    rounds at 4 dp. Ranking ties break by doc_id; docs with equal
    //    (tf, dl) profiles score bit-identically in both engines.
    QueryDef(
      "ext51_bm25",
      (s, d) => {
        import s.implicits._
        val queries = Seq(
          (1, "merge"), (1, "join"),
          (2, "window"), (2, "sort"),
          (3, "stream"), (3, "batch"), (3, "spark"))
          .toDF("query_id", "term")
        Retrieval.bm25(Tables.documents(s, d), queries)
          .select(col("query_id"), col("doc_id"), col("rank"),
            graft.Num.rnd(col("score"), 4).as("score"))
      },
      Some(s"""WITH q(query_id, term) AS (
              |  VALUES (1, 'merge'), (1, 'join'),
              |         (2, 'window'), (2, 'sort'),
              |         (3, 'stream'), (3, 'batch'), (3, 'spark')
              |), tk AS (
              |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
              |), dl AS (
              |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
              |  FROM documents
              |), nstat AS (SELECT COUNT(*) AS n_docs FROM documents),
              |astat AS (SELECT AVG(dl) AS avgdl FROM dl),
              |tf AS (
              |  SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY 1, 2
              |), rtf AS (
              |  SELECT q.query_id, q.term, tf.doc_id, tf.tf
              |  FROM tf JOIN q ON tf.term = q.term
              |), df AS (
              |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM rtf GROUP BY 1
              |), sc AS (
              |  SELECT r.query_id, r.doc_id,
              |         SUM(ln(1.0 + ((SELECT n_docs FROM nstat) - df.df + 0.5)
              |                        / (df.df + 0.5))
              |             * (r.tf * (1.2 + 1.0))
              |             / (r.tf + 1.2 * (1.0 - 0.75
              |                + 0.75 * dl.dl / (SELECT avgdl FROM astat)))) AS score
              |  FROM rtf r JOIN df ON r.term = df.term JOIN dl ON r.doc_id = dl.doc_id
              |  GROUP BY 1, 2
              |), rk AS (
              |  SELECT query_id, doc_id, score,
              |         ROW_NUMBER() OVER (PARTITION BY query_id
              |                            ORDER BY score DESC, doc_id) AS rank
              |  FROM sc
              |)
              |SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank,
              |       ${Sql.rnd("score", 4)} AS score
              |FROM rk WHERE rank <= 5""".stripMargin),
      bench = true),

    // ── EXT52 — classifier TRAINING (the learning half of ext47's
    //    fastText-shape gate): full-batch logistic GD, 3 fixed
    //    iterations from w = 0, labels = (lang = 'en'). The feature
    //    table builds once and persists; per iteration the weight
    //    lookup is a codegen'd array literal (no join), margins and
    //    gradients are map-side-combinable keyed aggregates, and only
    //    the 256-float vector touches the driver. The oracle unrolls
    //    the same three steps as CTEs; iteration 1 is exactly dyadic,
    //    later sum-order/libm noise (~1e-13) sits far under the 6-dp
    //    rounding.
    QueryDef(
      "ext52_classifier_train",
      (s, d) =>
        TextOps.trainHashedClassifier(
          Tables.documents(s, d), col("lang") === "en")
          .select(col("bucket"), graft.Num.rnd(col("weight"), 6).as("weight")),
      Some(ClassifierTrainOracle),
      bench = true),

    // ── EXT53 — per-source document caps (the CommonCrawl domain-cap
    //    staple): at most 10 docs per source, longest-first. The rank
    //    filter plans a WindowGroupLimit pair — partial top-N per
    //    partition BEFORE the shuffle — so a mega-domain never ships
    //    its full membership (CurationSpec pins the plan).
    QueryDef(
      "ext53_source_cap",
      (s, d) => Curation.sourceCap(Tables.documents(s, d), maxPerGroup = 10),
      Some("""WITH rk AS (
             |  SELECT source, doc_id,
             |         ROW_NUMBER() OVER (PARTITION BY source
             |                            ORDER BY n_chars DESC, doc_id) AS rk
             |  FROM documents
             |)
             |SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
             |FROM rk WHERE rk <= 10""".stripMargin),
      bench = true)
  )

  private def ClassifierTrainOracle: String =
    s"""WITH tk AS (
              |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
              |), hx AS (
              |  SELECT doc_id,
              |         CAST((CASE WHEN ascii(substr(md5(tok), 1, 1)) >= 97
              |               THEN ascii(substr(md5(tok), 1, 1)) - 87
              |               ELSE ascii(substr(md5(tok), 1, 1)) - 48 END) * 16 +
              |              (CASE WHEN ascii(substr(md5(tok), 2, 1)) >= 97
              |               THEN ascii(substr(md5(tok), 2, 1)) - 87
              |               ELSE ascii(substr(md5(tok), 2, 1)) - 48 END) AS BIGINT) AS b
              |  FROM tk
              |), x AS (
              |  SELECT doc_id, b, COUNT(*) AS cnt FROM hx GROUP BY 1, 2
              |), y AS (
              |  SELECT doc_id, CAST(lang = 'en' AS BIGINT) AS y FROM documents
              |), nn AS (SELECT COUNT(*) AS n FROM documents),
              |w0 AS (
              |  SELECT CAST(unnest(range(0, 256)) AS BIGINT) AS b, 0.0 AS weight
              |), ${(1 to 3).map(classifierGdStage).mkString(", ")}
              |SELECT b AS bucket, ${Sql.rnd("weight", 6)} AS weight FROM w3""".stripMargin

  /** One unrolled gradient-descent stage for the ext52 oracle: margins
    * from the previous weight vector, logistic residuals, per-bucket
    * gradient, rate-0.5 update (COALESCE keeps untouched buckets). */
  private def classifierGdStage(i: Int): String = {
    val prev = s"w${i - 1}"
    s"""m$i AS (
       |  SELECT x.doc_id, SUM(w.weight * x.cnt) AS margin
       |  FROM x JOIN $prev w ON x.b = w.b GROUP BY 1
       |), e$i AS (
       |  SELECT m.doc_id, 1.0 / (1.0 + exp(-m.margin)) - y.y AS e
       |  FROM m$i m JOIN y ON m.doc_id = y.doc_id
       |), g$i AS (
       |  SELECT x.b, SUM(e.e * x.cnt) AS g
       |  FROM e$i e JOIN x ON e.doc_id = x.doc_id GROUP BY 1
       |), w$i AS (
       |  SELECT w.b,
       |         w.weight - (0.5 * COALESCE(g.g, 0.0)) / (SELECT n FROM nn) AS weight
       |  FROM $prev w LEFT JOIN g$i g ON w.b = g.b
       |)""".stripMargin
  }

  /** EXT35 lane list appendix — see [[graft.ops.TextOps.unigramLogProb]].
    * (A `def`, not a `val`: `all` initializes first in the object body.) */
  private def Ext35: Seq[QueryDef] = Seq(
    // ── EXT35 — unigram LM scoring (the portable core of CCNet-style
    //    perplexity filtering): per-doc mean token log-probability under
    //    the corpus's own unigram distribution. Token-keyed enrich join,
    //    never a vocabulary broadcast; only the grand total crosses as a
    //    single-row broadcast after the per-doc aggregate.
    QueryDef(
      "ext35_unigram_logprob",
      (s, d) => TextOps.unigramLogProb(Tables.documents(s, d)),
      Some(s"""WITH tok AS (
              |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
              |), tf AS (
              |  SELECT token, COUNT(*) AS cnt FROM tok GROUP BY 1
              |), tot AS (
              |  SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM tf
              |)
              |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
              |       ${Sql.rnd(
                 "(SUM(ln(CAST(cnt AS DOUBLE))) - COUNT(*) * ln(total)) / COUNT(*)", 4)}
              |         AS avg_logp
              |FROM tok JOIN tf USING (token), tot
              |GROUP BY doc_id, total""".stripMargin)),

    // ── EXT36a — per-document filter verdicts: the four-rule quality
    //    funnel's flags (exact-integer predicates; the LM rule compares
    //    the canonically-rounded avg_logp — see QualityFunnel).
    QueryDef(
      "ext36_filter_flags",
      (s, d) => QualityFunnel.filterFlags(Tables.documents(s, d)),
      Some(FunnelFlagsCte +
        """SELECT doc_id, pass_len, pass_rep, pass_stop, pass_lm,
          |       CAST(pass_len * pass_rep * pass_stop * pass_lm AS BIGINT) AS pass_all
          |FROM flags""".stripMargin)),

    // ── EXT36b — the funnel itself: sequential per-rule attrition
    //    (n_in / n_fail / n_out per rule, ablation-table semantics —
    //    a doc failing two rules counts against the first).
    QueryDef(
      "ext36_funnel",
      (s, d) => QualityFunnel.filterFunnel(Tables.documents(s, d)),
      Some(FunnelFlagsCte +
        """, alive AS (
          |  SELECT COUNT(*) AS n,
          |         SUM(pass_len) AS s0,
          |         SUM(pass_len * pass_rep) AS s1,
          |         SUM(pass_len * pass_rep * pass_stop) AS s2,
          |         SUM(pass_len * pass_rep * pass_stop * pass_lm) AS s3
          |  FROM flags
          |)
          |SELECT CAST(step AS BIGINT) AS step, rule,
          |       CAST(n_in AS BIGINT) AS n_in,
          |       CAST(n_in - n_out AS BIGINT) AS n_fail,
          |       CAST(n_out AS BIGINT) AS n_out
          |FROM alive, LATERAL (VALUES
          |  (1, 'len',  n,  s0),
          |  (2, 'rep',  s0, s1),
          |  (3, 'stop', s1, s2),
          |  (4, 'lm',   s2, s3)) AS t(step, rule, n_in, n_out)""".stripMargin)),

    // ── EXT36c — the ORDER-FREE relaxation report: per rule, documents
    //    failing it while passing every OTHER rule — what relaxing that
    //    one rule alone would recover (a doc failing two rules appears
    //    in neither count). The threshold-tuning companion to the
    //    funnel's sequential attrition.
    QueryDef(
      "ext36_relaxation",
      (s, d) => QualityFunnel.relaxationSavings(Tables.documents(s, d)),
      Some(FunnelFlagsCte +
        """, agg AS (
          |  SELECT SUM((1 - pass_len) * pass_rep * pass_stop * pass_lm) AS s_len,
          |         SUM(pass_len * (1 - pass_rep) * pass_stop * pass_lm) AS s_rep,
          |         SUM(pass_len * pass_rep * (1 - pass_stop) * pass_lm) AS s_stop,
          |         SUM(pass_len * pass_rep * pass_stop * (1 - pass_lm)) AS s_lm
          |  FROM flags
          |)
          |SELECT rule, CAST(n_recovered AS BIGINT) AS n_recovered
          |FROM agg, LATERAL (VALUES
          |  ('len', s_len), ('rep', s_rep),
          |  ('stop', s_stop), ('lm', s_lm)) AS t(rule, n_recovered)""".stripMargin)),

    // ── EXT37 — DSIR-style importance selection: top-100 documents by
    //    the target-vs-source unigram log importance ratio (target model
    //    trained on the src0 slice, source model on the whole corpus).
    //    Deterministic (weight DESC, doc_id) quota — the oracle replays
    //    both models, both scores, the difference, and the cut.
    QueryDef(
      "ext37_dsir_select",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val (tTf, tTot) = TextOps.unigramModel(docs.filter(col("source") === "src0"))
        val (sTf, sTot) = TextOps.unigramModel(docs)
        Sampling.importanceSelect(docs, tTf, tTot, sTf, sTot, quota = 100)
      },
      Some(s"""WITH tok AS (
              |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
              |), ttf AS (
              |  SELECT token, COUNT(*) AS cnt FROM (
              |    SELECT unnest(string_split(text, ' ')) AS token
              |    FROM documents WHERE source = 'src0') GROUP BY 1
              |), ttot AS (
              |  SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM ttf
              |), stf AS (
              |  SELECT token, COUNT(*) AS cnt FROM tok GROUP BY 1
              |), stot AS (
              |  SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM stf
              |), lt AS (
              |  SELECT doc_id,
              |         ${Sql.rnd("(SUM(ln(CAST(COALESCE(t.cnt, 1) AS DOUBLE))) " +
                 "- COUNT(*) * ln(ttot.total)) / COUNT(*)", 4)} AS lp
              |  FROM tok LEFT JOIN ttf t USING (token), ttot
              |  GROUP BY doc_id, ttot.total
              |), ls AS (
              |  SELECT doc_id,
              |         ${Sql.rnd("(SUM(ln(CAST(COALESCE(s.cnt, 1) AS DOUBLE))) " +
                 "- COUNT(*) * ln(stot.total)) / COUNT(*)", 4)} AS lp
              |  FROM tok LEFT JOIN stf s USING (token), stot
              |  GROUP BY doc_id, stot.total
              |)
              |SELECT lt.doc_id, ${Sql.rnd("lt.lp - ls.lp", 4)} AS weight
              |FROM lt JOIN ls ON lt.doc_id = ls.doc_id
              |ORDER BY weight DESC, lt.doc_id LIMIT 100""".stripMargin)),

    // ── EXT38 — sliding-window chunking (16-token windows, stride 8):
    //    the RAG / context-shaping pass. Zero-shuffle per-row explode;
    //    the oracle replays starts, clamped slices, and the
    //    reconstructed chunk text.
    QueryDef(
      "ext38_chunk_windows",
      (s, d) => TextOps.slidingChunks(Tables.documents(s, d), chunkSize = 16, stride = 8),
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
             |), st AS (
             |  SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n,
             |         CAST(unnest(range(0, len(l), 8)) AS BIGINT) AS chunk_start
             |  FROM d
             |)
             |SELECT doc_id,
             |       CAST(chunk_start / 8 AS BIGINT) AS chunk_id,
             |       chunk_start,
             |       CAST(LEAST(16, n - chunk_start) AS BIGINT) AS chunk_tokens,
             |       array_to_string(l[chunk_start + 1 : chunk_start + 16], ' ')
             |         AS text_chunk
             |FROM st""".stripMargin)),

    // ── EXT38b — the TOKENIZER SEAM exercised end-to-end: the same
    //    chunking operator under the regex pre-tokenizer
    //    (TextOps.regexTokens, lowercase runs of ≥ 2 chars) instead of
    //    whitespace split. Non-vacuous on the fixture: single-char "a"
    //    tokens are dropped, so starts/lengths/chunk text all shift.
    //    The oracle mirrors the tokenizer with regexp_extract_all —
    //    proving the seam swaps tokenization WITHOUT forking the
    //    operator (zero changes to the whitespace lane or its oracle).
    QueryDef(
      "ext38_chunk_windows_regex",
      (s, d) => TextOps.slidingChunks(
        Tables.documents(s, d), chunkSize = 16, stride = 8, tok = TextOps.regexTokens),
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_extract_all(text, '[a-z]{2,}') AS l FROM documents
             |), st AS (
             |  SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n,
             |         CAST(unnest(range(0, len(l), 8)) AS BIGINT) AS chunk_start
             |  FROM d
             |)
             |SELECT doc_id,
             |       CAST(chunk_start / 8 AS BIGINT) AS chunk_id,
             |       chunk_start,
             |       CAST(LEAST(16, n - chunk_start) AS BIGINT) AS chunk_tokens,
             |       array_to_string(l[chunk_start + 1 : chunk_start + 16], ' ')
             |         AS text_chunk
             |FROM st""".stripMargin)),

    // ── EXT35b — bigram conditional LM scoring: mean ln p(w_i|w_{i-1})
    //    under the corpus's own MLE bigram model — the n-gram ladder
    //    step above ext35 (rare CONTINUATIONS of common words now score
    //    low). Zero-shuffle bigram explode + two vocabulary-keyed
    //    enrich joins; the oracle replays bigrams by list slicing.
    QueryDef(
      "ext35_bigram_logprob",
      (s, d) => TextOps.bigramLogProb(Tables.documents(s, d)),
      Some(s"""WITH d AS (
              |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
              |), pos AS (
              |  SELECT doc_id, unnest(range(1, len(l))) AS i, l FROM d
              |), bo AS (
              |  SELECT doc_id, l[i] AS prev, l[i] || ' ' || l[i + 1] AS bg FROM pos
              |), btf AS (
              |  SELECT bg, COUNT(*) AS cb FROM bo GROUP BY 1
              |), ptf AS (
              |  SELECT prev, COUNT(*) AS cp FROM bo GROUP BY 1
              |)
              |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
              |       ${Sql.rnd(
                 "SUM(ln(CAST(cb AS DOUBLE)) - ln(CAST(cp AS DOUBLE))) / COUNT(*)", 4)}
              |         AS avg_logp
              |FROM bo JOIN btf USING (bg) JOIN ptf USING (prev)
              |GROUP BY doc_id""".stripMargin)),

    // ── EXT48 — leakage-safe split: train/val/test assignment by
    //    near-dup GROUP (connected component of the Jaccard-0.5 pair
    //    graph; singletons are their own group), so a near-dup cluster
    //    never straddles splits. modBucket on the group id keeps the
    //    oracle exact: the recursive CTE recomputes the closure and the
    //    same modular cut. The straddle-prevention law is pinned in
    //    SamplingSpec with a planted cross-split near-dup pair.
    QueryDef(
      "ext48_leakage_split",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Sampling.leakageSafeSplit(
          docs, Dedup.jaccardPairs(docs, 3, 0.5),
          Seq(("train", 80), ("val", 10), ("test", 10)), Sampling.modBucket)
      },
      Some(DocShinglesCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, edges AS (
          |  SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.5
          |  UNION ALL
          |  SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.5
          |), reach(doc_id, r) AS (
          |  SELECT src, src FROM edges
          |  UNION
          |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id
          |), comp AS (
          |  SELECT doc_id, MIN(r) AS component FROM reach GROUP BY 1
          |)
          |SELECT d.doc_id,
          |       COALESCE(c.component, d.doc_id) AS group_id,
          |       CASE WHEN COALESCE(c.component, d.doc_id) % 100 < 80 THEN 'train'
          |            WHEN COALESCE(c.component, d.doc_id) % 100 < 90 THEN 'val'
          |            ELSE 'test' END AS split
          |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id""".stripMargin)),

    // ── EXT48b — the PRODUCTION leakage-safe split: the pair relation
    //    comes from banded MinHash LSH (guarded m=2, the sf10-surviving
    //    config) instead of the exact inverted-index join. On the
    //    fixture LSH finds exactly the exact-Jaccard pair set (the
    //    ext2_minhash_lsh_guarded contract), so the SAME recursive
    //    closure oracle applies — the lane proves the scale path drops
    //    into the pairs seam with zero semantic drift.
    QueryDef(
      "ext48_leakage_split_lsh",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Sampling.leakageSafeSplit(
          docs, Dedup.minhashLshPairs(docs, minBandMatches = 2)
            .select("doc_a", "doc_b"),
          Seq(("train", 80), ("val", 10), ("test", 10)), Sampling.modBucket)
      },
      Some(DocShinglesCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, edges AS (
          |  SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.5
          |  UNION ALL
          |  SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.5
          |), reach(doc_id, r) AS (
          |  SELECT src, src FROM edges
          |  UNION
          |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id
          |), comp AS (
          |  SELECT doc_id, MIN(r) AS component FROM reach GROUP BY 1
          |)
          |SELECT d.doc_id,
          |       COALESCE(c.component, d.doc_id) AS group_id,
          |       CASE WHEN COALESCE(c.component, d.doc_id) % 100 < 80 THEN 'train'
          |            WHEN COALESCE(c.component, d.doc_id) % 100 < 90 THEN 'val'
          |            ELSE 'test' END AS split
          |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id""".stripMargin)),

    // ── EXT47 — hashing-trick linear classifier (fastText shape,
    //    Joulin et al. 2016): tokens hash to 256 buckets via the first
    //    two md5 hex chars; the doc score is the broadcast weight
    //    vector summed over features. The lane's weights are the
    //    deterministic DemoClassifierWeights so the oracle replays
    //    them as arithmetic; integer score_sum is hash-exact.
    QueryDef(
      "ext47_hash_classifier",
      (s, d) =>
        TextOps.hashedClassifierScore(
          Tables.documents(s, d), TextOps.DemoClassifierWeights),
      Some(s"""WITH tk AS (
              |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
              |), h AS (
              |  SELECT doc_id,
              |         (CASE WHEN ascii(substr(md5(tok), 1, 1)) >= 97
              |               THEN ascii(substr(md5(tok), 1, 1)) - 87
              |               ELSE ascii(substr(md5(tok), 1, 1)) - 48 END) * 16 +
              |         (CASE WHEN ascii(substr(md5(tok), 2, 1)) >= 97
              |               THEN ascii(substr(md5(tok), 2, 1)) - 87
              |               ELSE ascii(substr(md5(tok), 2, 1)) - 48 END) AS b
              |  FROM tk
              |), sc AS (
              |  SELECT doc_id, COUNT(*) AS n, SUM(((b * 37) % 21) - 10) AS s
              |  FROM h GROUP BY 1
              |)
              |SELECT doc_id, CAST(n AS BIGINT) AS n_features,
              |       CAST(s AS BIGINT) AS score_sum,
              |       ${Sql.rnd("CAST(s AS DOUBLE) / n", 4)} AS mean_score,
              |       s >= 0 AS keep
              |FROM sc""".stripMargin),
      bench = true),

    // ── EXT46 — line-level dedup (RefinedWeb, Penedo et al. 2023):
    //    lines appearing in ≥ 2 distinct documents are boilerplate and
    //    removed from every document; docs reassemble from surviving
    //    lines in order (one output row per input doc, empties kept).
    //    The fixture is newline-free, so "lines" are aligned 8-token
    //    windows (the segmentation-seam default on a real corpus is
    //    split-on-newline); the oracle replays segmentation, distinct-df,
    //    removal and ordered reassembly exactly. The fixture's exact-dup
    //    clusters make the removal observable (their every line has
    //    df ≥ 2).
    QueryDef(
      "ext46_line_dedup",
      (s, d) =>
        Dedup.lineDedup(Tables.documents(s, d), maxDf = 2L,
          seg = TextOps.tokenWindowLines(8)),
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
             |), lines AS (
             |  SELECT doc_id, i AS line_no,
             |         array_to_string(l[8 * i + 1 : 8 * i + 8], ' ') AS line
             |  FROM (SELECT doc_id, l,
             |               unnest(range(0, CAST(ceil(len(l) / 8.0) AS BIGINT))) AS i
             |        FROM d)
             |), hot AS (
             |  SELECT line
             |  FROM (SELECT line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY 1)
             |  WHERE df >= 2
             |), kept AS (
             |  SELECT * FROM lines WHERE line NOT IN (SELECT line FROM hot)
             |), reb AS (
             |  SELECT doc_id, COUNT(*) AS n_kept,
             |         string_agg(line, chr(10) ORDER BY line_no) AS text2
             |  FROM kept GROUP BY 1
             |)
             |SELECT d.doc_id, COALESCE(reb.text2, '') AS text,
             |       CAST(ceil(len(d.l) / 8.0) AS BIGINT) AS n_lines,
             |       CAST(ceil(len(d.l) / 8.0) AS BIGINT) - COALESCE(reb.n_kept, 0)
             |         AS n_lines_removed
             |FROM d LEFT JOIN reb ON d.doc_id = reb.doc_id""".stripMargin),
      bench = true),

    // ── EXT35c — trigram stupid-backoff scoring (Brants et al. 2007):
    //    the eval slice (doc_id % 5 = 0) scored under a model counted
    //    from the train slice (% 5 ≠ 0) — the cross-corpus form that
    //    actually exercises all four backoff tiers (self-scored corpora
    //    never back off). The oracle recomputes counts, prefix
    //    denominators, the tiered CASE and the per-tier diagnostics
    //    from first principles over the same split.
    QueryDef(
      "ext35_backoff_logprob",
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextOps.backoffLogProb(
          docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0))
      },
      Some(s"""WITH d AS (
              |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
              |), t3 AS (
              |  SELECT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS g,
              |         l[i] || ' ' || l[i+1] AS pre2
              |  FROM (SELECT doc_id, unnest(range(1, len(l) - 1)) AS i, l FROM d WHERE doc_id % 5 <> 0)
              |), t2 AS (
              |  SELECT doc_id, l[i] || ' ' || l[i+1] AS g, l[i] AS prev
              |  FROM (SELECT doc_id, unnest(range(1, len(l))) AS i, l FROM d WHERE doc_id % 5 <> 0)
              |), t1 AS (
              |  SELECT doc_id, unnest(l) AS g FROM d WHERE doc_id % 5 <> 0
              |), c3 AS (SELECT g, COUNT(*) AS ct FROM t3 GROUP BY 1),
              |   p2 AS (SELECT pre2, COUNT(*) AS cbp FROM t3 GROUP BY 1),
              |   c2 AS (SELECT g, COUNT(*) AS cb FROM t2 GROUP BY 1),
              |   p1 AS (SELECT prev, COUNT(*) AS cup FROM t2 GROUP BY 1),
              |   c1 AS (SELECT g, COUNT(*) AS cu FROM t1 GROUP BY 1),
              |   nt AS (SELECT SUM(cu) AS n FROM c1),
              |   tri3 AS (SELECT c3.g AS tri, ct, cbp
              |            FROM c3 JOIN p2 ON p2.pre2 = array_to_string(string_split(c3.g, ' ')[1:2], ' ')),
              |   bi2 AS (SELECT c2.g AS bg, cb, cup
              |           FROM c2 JOIN p1 ON p1.prev = string_split(c2.g, ' ')[1]),
              |   ev AS (
              |  SELECT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS tri,
              |         l[i+1] || ' ' || l[i+2] AS bg, l[i+2] AS w
              |  FROM (SELECT doc_id, unnest(range(1, len(l) - 1)) AS i, l FROM d WHERE doc_id % 5 = 0)
              |), tier AS (
              |  SELECT ev.doc_id,
              |         CASE WHEN ct IS NOT NULL THEN ln(CAST(ct AS DOUBLE)) - ln(CAST(cbp AS DOUBLE))
              |              WHEN cb IS NOT NULL THEN ln(0.4) + ln(CAST(cb AS DOUBLE)) - ln(CAST(cup AS DOUBLE))
              |              WHEN cu IS NOT NULL THEN 2 * ln(0.4) + ln(CAST(cu AS DOUBLE)) - ln(CAST((SELECT n FROM nt) AS DOUBLE))
              |              ELSE 3 * ln(0.4) - ln(CAST((SELECT n FROM nt) AS DOUBLE)) END AS logs,
              |         CASE WHEN ct IS NOT NULL THEN 'tri'
              |              WHEN cb IS NOT NULL THEN 'bi'
              |              WHEN cu IS NOT NULL THEN 'uni' ELSE 'oov' END AS tier
              |  FROM ev
              |  LEFT JOIN tri3 ON ev.tri = tri3.tri
              |  LEFT JOIN bi2 ON ev.bg = bi2.bg
              |  LEFT JOIN c1 ON ev.w = c1.g
              |)
              |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
              |       CAST(SUM(CASE WHEN tier = 'tri' THEN 1 ELSE 0 END) AS BIGINT) AS n_tri_hits,
              |       CAST(SUM(CASE WHEN tier = 'bi' THEN 1 ELSE 0 END) AS BIGINT) AS n_bi_hits,
              |       CAST(SUM(CASE WHEN tier = 'uni' THEN 1 ELSE 0 END) AS BIGINT) AS n_uni_hits,
              |       CAST(SUM(CASE WHEN tier = 'oov' THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
              |       ${Sql.rnd("SUM(logs) / COUNT(*)", 4)} AS avg_logs
              |FROM tier GROUP BY doc_id""".stripMargin),
      bench = true),

    // ── EXT41 — winnowing fingerprints (Schleimer et al. 2003, MOSS):
    //    per-doc rightmost-min of each w-window of k-gram md5 hashes,
    //    distinct — the guarantee-carrying fingerprint set (any
    //    ≥ w+k−1-token match shares a fingerprint). String-min over
    //    md5 hex + position encoding keeps the selection bit-identical
    //    in both engines.
    QueryDef(
      "ext41_winnow",
      (s, d) => TextOps.winnowFingerprints(Tables.documents(s, d)),
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
             |), occ AS (
             |  SELECT doc_id, unnest(range(1, greatest(len(l) - 3 + 2, 1))) AS g, l FROM d
             |), o2 AS (
             |  SELECT doc_id, CAST(g AS BIGINT) - 1 AS pos,
             |         md5(array_to_string(l[g:g + 2], ' ')) AS h
             |  FROM occ
             |), n AS (
             |  SELECT doc_id, COUNT(*) AS ng FROM o2 GROUP BY 1
             |), enc AS (
             |  SELECT doc_id, pos,
             |         h || '#' || lpad(CAST(10000000000 - pos AS VARCHAR), 11, '0') AS e
             |  FROM o2
             |), selw AS (
             |  SELECT doc_id, pos,
             |         MIN(e) OVER (PARTITION BY doc_id ORDER BY pos
             |           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
             |  FROM enc
             |)
             |SELECT DISTINCT s.doc_id,
             |       CAST(10000000000 - CAST(string_split(s.sel, '#')[2] AS BIGINT) AS BIGINT)
             |         AS pos,
             |       string_split(s.sel, '#')[1] AS fp
             |FROM selw s JOIN n USING (doc_id)
             |WHERE s.pos <= n.ng - 4""".stripMargin)),

    // ── EXT40 — cluster-balanced subsampling: nearest-cell assignment
    //    under a FROZEN quantizer (the k lowest-vec_id embeddings — no
    //    training iteration, so membership replays exactly in SQL) +
    //    a deterministic per-cell quota ordered by the EXT30 shuffle
    //    permutation. Flattens mode imbalance a uniform cut preserves.
    //    Oracle recomputes scores (e·c − |c|²/2, list_dot_product both
    //    sides, ties to the lower cell) and the quota windows.
    QueryDef(
      "ext40_cluster_balance",
      (s, d) => Similarity.clusterBalancedSample(Tables.embeddings(s, d)),
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
             |), seeds AS (
             |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
             |         CAST(embedding AS DOUBLE[]) AS c
             |  FROM embeddings ORDER BY vec_id LIMIT 8
             |), scored AS (
             |  SELECT e.vec_id, s.cell,
             |         list_dot_product(e.emb, s.c) - list_dot_product(s.c, s.c) / 2
             |           AS score
             |  FROM e CROSS JOIN seeds s
             |), assigned AS (
             |  SELECT vec_id, cell FROM (
             |    SELECT vec_id, cell,
             |           ROW_NUMBER() OVER (PARTITION BY vec_id
             |             ORDER BY score DESC, cell) AS rk
             |    FROM scored) WHERE rk = 1
             |)
             |SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM (
             |  SELECT vec_id, cell,
             |         ROW_NUMBER() OVER (PARTITION BY cell
             |           ORDER BY (vec_id * 40503) % 1048576, vec_id) AS rk
             |  FROM assigned) WHERE rk <= 50""".stripMargin)),

    // ── EXT39 — fuzzy dedup: LSH candidates verified by EDIT DISTANCE
    //    (the BigCode/StarCoder near-dedup shape — Jaccard compares
    //    token sets and forgives rearrangement; levenshtein sees order).
    //    Non-vacuous on the fixture: of the 25 exact-Jaccard ≥ 0.5
    //    pairs, 24 sit at edit distance 4 and one at 8 — the ≤ 5 gate
    //    keeps exactly the 24. Oracle = exact all-pairs Jaccard AND
    //    levenshtein (the quadratic side lives in the oracle only;
    //    the engine's candidates ride the banded capped LSH join).
    QueryDef(
      "ext39_edit_neardup",
      (s, d) => Dedup.editNearDupPairs(Tables.documents(s, d)),
      Some(DocShinglesCte +
        """SELECT j.doc_a, j.doc_b,
          |       CAST(levenshtein(x.text, y.text) AS BIGINT) AS edit_dist
          |FROM jac j
          |JOIN documents x ON x.doc_id = j.doc_a
          |JOIN documents y ON y.doc_id = j.doc_b
          |WHERE j.jaccard >= 0.5 AND levenshtein(x.text, y.text) <= 5""".stripMargin)),

    // ── EXT34c — SemDeDup at TAIL RECALL over an INEXACT-neighbor
    //    corpus: the ext34 lanes plant exact copies (found structurally
    //    at any LSH sizing); this lane plants GENUINELY PERTURBED
    //    neighbors — every 10th vector re-inserted with its first
    //    component nudged by 0.1·‖e‖, cosine ≈ 0.995, θ > 0 — and runs
    //    the HIGH-RECALL sign-LSH preset (planes=16, tables=16). Per
    //    signLshPairRecall the preset's miss probability at the planted
    //    angle is ~5·10⁻⁷ per pair (vs ~7·10⁻³ at the exact-copy
    //    default — which would flake a 200-pair corpus roughly every
    //    other run; at the 0.95 threshold itself the gap is ~0.96 vs
    //    ~0.49, pinned in DedupSimilaritySpec where a hash compare
    //    can't flake). The oracle prunes against exact all-pairs
    //    ground truth: green ⇔ the tail preset surfaced every inexact
    //    semantic dup the greedy rule needed, at an angle where the
    //    default's hash-compare would not be reliably green. The
    //    perturbation replays exactly — both engines
    //    compute e[0] + 0.1·sqrt(Σe·e) in double over float-promoted
    //    inputs and round once through FLOAT (the stored column type).
    QueryDef(
      "ext34_semdedup_tail",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val nudged = e.filter(col("vec_id") % 10 === 0)
          .withColumn("vec_id", col("vec_id") + lit(10000000L))
          .withColumn("embedding",
            concat(
              array((element_at(col("embedding"), 1) +
                lit(0.1) * Similarity.norm(col("embedding"))).cast("float")),
              slice(col("embedding"), 2, 63)))
        val corpus = e.unionByName(nudged)
        val dropIds = Similarity.nearDupPairsLsh(corpus, planes = 16, tables = 16)
          .select(col("vec_b").as("vec_id")).distinct()
        corpus.join(dropIds, Seq("vec_id"), "left_anti").select("vec_id")
      },
      bench = true,
      sql = Some("""WITH base AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
             |), pe AS (
             |  SELECT vec_id, emb FROM base
             |  UNION ALL
             |  SELECT vec_id + 10000000,
             |         [CAST(CAST(emb[1] + 0.1 * sqrt(list_dot_product(emb, emb))
             |            AS FLOAT) AS DOUBLE)] || emb[2:] AS emb
             |  FROM base WHERE vec_id % 10 = 0
             |), e AS (
             |  SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM pe
             |), drop_ids AS (
             |  SELECT DISTINCT b.vec_id
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id
             |  WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) >= 0.95
             |)
             |SELECT vec_id FROM pe
             |WHERE vec_id NOT IN (SELECT vec_id FROM drop_ids)""".stripMargin)),

    // ── EXT41b — winnowing CONTAINMENT pairs: the MOSS composition —
    //    join documents on shared winnow fingerprints (density ~2/(w+1)
    //    of the grams, so the join input is a fraction of what the raw
    //    decontam shingle join moves), count shared selections per
    //    pair, normalize by the smaller doc's full fingerprint set.
    //    Doc-frequency guard (map-side groupBy → anti-join, the
    //    decontam maxTrainDf shape) bounds the per-fingerprint C(d,2)
    //    fan-out. Oracle replays the winnow selection bit-identically
    //    (same encoding as ext41) and the same join — green ⇔ the
    //    fingerprint sets AND the pair arithmetic both replay.
    QueryDef(
      "ext41_winnow_pairs",
      (s, d) => TextOps.winnowPairs(Tables.documents(s, d)),
      bench = true,
      sql = Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
             |), occ AS (
             |  SELECT doc_id, unnest(range(1, greatest(len(l) - 3 + 2, 1))) AS g, l FROM d
             |), o2 AS (
             |  SELECT doc_id, CAST(g AS BIGINT) - 1 AS pos,
             |         md5(array_to_string(l[g:g + 2], ' ')) AS h
             |  FROM occ
             |), n AS (
             |  SELECT doc_id, COUNT(*) AS ng FROM o2 GROUP BY 1
             |), enc AS (
             |  SELECT doc_id, pos,
             |         h || '#' || lpad(CAST(10000000000 - pos AS VARCHAR), 11, '0') AS e
             |  FROM o2
             |), selw AS (
             |  SELECT doc_id, pos,
             |         MIN(e) OVER (PARTITION BY doc_id ORDER BY pos
             |           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
             |  FROM enc
             |), wfp AS (
             |  SELECT DISTINCT s.doc_id, string_split(s.sel, '#')[1] AS fp
             |  FROM selw s JOIN n USING (doc_id)
             |  WHERE s.pos <= n.ng - 4
             |), sz AS (
             |  SELECT doc_id, COUNT(*) AS n_fp FROM wfp GROUP BY 1
             |), dfq AS (
             |  SELECT fp, COUNT(*) AS dfc FROM wfp GROUP BY 1
             |), g2 AS (
             |  SELECT w.doc_id, w.fp FROM wfp w JOIN dfq USING (fp) WHERE dfc <= 100
             |), sh AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |         CAST(COUNT(*) AS BIGINT) AS shared
             |  FROM g2 a JOIN g2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
             |)
             |SELECT doc_a, doc_b, shared,
             |       """.stripMargin +
        Sql.rnd(
          "CAST(shared AS DOUBLE) / CAST(least(na.n_fp, nb.n_fp) AS DOUBLE)", 4) +
        """ AS containment
          |FROM sh JOIN sz na ON na.doc_id = doc_a
          |JOIN sz nb ON nb.doc_id = doc_b""".stripMargin)),

    // ── EXT40b — cluster-balanced subsampling under a TRAINED
    //    quantizer (kmeansCentroids, the production form): cells follow
    //    the corpus's actual density modes instead of the k lowest-id
    //    seeds. Trained centroids depend on float summation order in
    //    the Lloyd averages, so the MEMBERSHIP can never hash-match a
    //    DuckDB replay — but the lane carries a full oracle anyway via
    //    a SCORECARD (the an13 pattern): the one exact value both
    //    engines agree on (corpus size — the anchor that catches a
    //    silently empty input) plus booleans pinning every
    //    centroid-independent LAW of the sample: per-cell quota
    //    honored, each cell's keep a COMPLETE min(pop, quota) prefix
    //    (the window kept neither more nor fewer), ids a distinct
    //    subset of the corpus, cells inside [0, k), and the total
    //    inside its provable envelope [min(n, quota), min(n, k·quota)].
    //    The oracle computes the same count and literal trues — green
    //    ⇔ every law holds. The detailed balance properties (mode
    //    flattening vs a uniform cut) stay pinned in
    //    DedupSimilaritySpec, the topKIvf-vs-topKBlocked trade.
    QueryDef(
      "ext40_cluster_balance_trained",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cents = Similarity.kmeansCentroids(e, k = 8, iters = 3)
        val sample = Similarity.clusterBalancedSample(e, cents, quota = 50)
        // the FULL assignment (quota = ∞) yields per-cell populations
        // without touching the private assignment seam
        val pops = Similarity.clusterBalancedSample(e, cents, quota = Int.MaxValue)
          .groupBy("cell").agg(count(lit(1)).as("pop"))
        val kept = sample.groupBy("cell").agg(count(lit(1)).as("kept"))
        val cellRow = pops.join(kept, Seq("cell"), "left")
          .na.fill(0L, Seq("kept"))
          .agg(
            max("kept").as("max_kept"),
            sum(when(col("kept") === least(col("pop"), lit(50L)), 0L)
              .otherwise(1L)).as("bad_cells"),
            min("cell").as("min_cell"), max("cell").as("max_cell"))
          .head()
        val n = e.count()
        val nKept = sample.count()
        val idsValid = sample.join(e, Seq("vec_id"), "left_anti").count() == 0 &&
          sample.select("vec_id").distinct().count() == nKept
        s.range(1).select(
          lit(n).as("n_vectors"),
          lit(cellRow.getLong(0) <= 50L).as("quota_ok"),
          lit(cellRow.getLong(1) == 0L).as("kept_complete"),
          lit(idsValid).as("ids_valid"),
          lit(cellRow.getLong(2) >= 0L && cellRow.getLong(3) <= 7L).as("cells_in_range"),
          lit(nKept >= math.min(n, 50L) && nKept <= math.min(n, 400L)).as("n_kept_bounded"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
             |       true AS quota_ok, true AS kept_complete, true AS ids_valid,
             |       true AS cells_in_range, true AS n_kept_bounded
             |FROM embeddings""".stripMargin)),

    // ── EXT42 — BPE vocabulary induction (Sennrich et al. 2016): the
    //    first 3 merge rules learned from the documents corpus. The
    //    oracle UNROLLS the training loop — per stage: adjacent-pair
    //    counts weighted by word frequency, the (count desc, pair asc)
    //    argmax, then the greedy left-to-right non-overlapping merge
    //    replayed via run-parity windows (occurrences of (x,x) in a
    //    run merge at odd run positions — the island trick; for x ≠ y
    //    occurrences never overlap and every one merges). Green ⇔ the
    //    engine's fold-based merge and the oracle's window-based merge
    //    agree on the full merge-resume chain, the portability question
    //    that makes BPE oracles genuinely hard.
    QueryDef(
      "ext42_bpe",
      (s, d) => graft.ops.Bpe.bpeMerges(Tables.documents(s, d), merges = 3),
      bench = true,
      sql = Some(BpeOracleK3)),

    // ── EXT42b — corpus-scale BPE ENCODE: per-doc token counts under
    //    the merges just learned (train + apply in one lane — the
    //    merge-resume chain AND the encode join both replay). The fold
    //    runs per DISTINCT WORD; docs meet the vocabulary in a keyed
    //    enrich join (the TF-IDF two-tier shape), so corpus cost is
    //    one tokenize pass + one join regardless of merge count.
    QueryDef(
      "ext42_bpe_encode",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val rules = graft.ops.Bpe.bpeMerges(docs, merges = 3)
          .collect().map(r => (r.getString(1), r.getString(2))).toSeq
        graft.ops.Bpe.encodeCounts(docs, rules)
      },
      Some(BpeStagesK3 + """,
        |docw AS (
        |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY 1, 2
        |)
        |SELECT doc_id, CAST(SUM(c * len(v3.syms)) AS BIGINT) AS n_bpe_tokens
        |FROM docw JOIN v3 USING (w)
        |GROUP BY doc_id""".stripMargin)),

    // ── EXT41c — winnowing-based DECONTAMINATION: the two-corpus
    //    containment screen over winnow fingerprints (train = %5 ≠ 0,
    //    eval = %5 = 0 — the ext20 split), with the train-side df
    //    guard. The guarantee makes the screen sound: any leaked eval
    //    span of ≥ w+k−1 tokens shares a fingerprint; density ~2/(w+1)
    //    makes it the cheap first pass before exact shingle decontam
    //    on flagged pairs. Fingerprints are per-doc, so each corpus
    //    winnows independently — the oracle winnows ALL documents once
    //    and splits after, proving exactly that property.
    QueryDef(
      "ext41_winnow_decontam",
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextOps.winnowContainment(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
             |), occ AS (
             |  SELECT doc_id, unnest(range(1, greatest(len(l) - 3 + 2, 1))) AS g, l FROM d
             |), o2 AS (
             |  SELECT doc_id, CAST(g AS BIGINT) - 1 AS pos,
             |         md5(array_to_string(l[g:g + 2], ' ')) AS h
             |  FROM occ
             |), n AS (
             |  SELECT doc_id, COUNT(*) AS ng FROM o2 GROUP BY 1
             |), enc AS (
             |  SELECT doc_id, pos,
             |         h || '#' || lpad(CAST(10000000000 - pos AS VARCHAR), 11, '0') AS e
             |  FROM o2
             |), selw AS (
             |  SELECT doc_id, pos,
             |         MIN(e) OVER (PARTITION BY doc_id ORDER BY pos
             |           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
             |  FROM enc
             |), wfp AS (
             |  SELECT DISTINCT s.doc_id, string_split(s.sel, '#')[1] AS fp
             |  FROM selw s JOIN n USING (doc_id)
             |  WHERE s.pos <= n.ng - 4
             |), tr AS (
             |  SELECT doc_id AS train_doc, fp FROM wfp WHERE doc_id % 5 <> 0
             |), ev AS (
             |  SELECT doc_id AS eval_doc, fp FROM wfp WHERE doc_id % 5 = 0
             |), ne AS (
             |  SELECT eval_doc, COUNT(*) AS n_eval FROM ev GROUP BY 1
             |), dfq AS (
             |  SELECT fp, COUNT(*) AS dfc FROM tr GROUP BY 1
             |), g2 AS (
             |  SELECT t.train_doc, t.fp FROM tr t JOIN dfq USING (fp) WHERE dfc <= 100
             |), sh AS (
             |  SELECT train_doc, eval_doc, CAST(COUNT(*) AS BIGINT) AS shared
             |  FROM g2 JOIN ev USING (fp)
             |  GROUP BY 1, 2
             |)
             |SELECT eval_doc, train_doc, shared,
             |       """.stripMargin +
        Sql.rnd("CAST(shared AS DOUBLE) / CAST(n_eval AS DOUBLE)", 4) +
        """ AS containment
          |FROM sh JOIN ne USING (eval_doc)
          |WHERE CAST(shared AS DOUBLE) / CAST(n_eval AS DOUBLE) >= 0.1""".stripMargin)),

    // ── EXT43 — CCNet-style perplexity bucketing: head/middle/tail
    //    quantile slices of the LM score (Wenzek et al. 2020 — train
    //    mostly on the head, keep a controlled tail slice for
    //    diversity). The rank is globalRankBy's two-pass
    //    range-partitioned shape — NO global window anywhere (the
    //    oracle's row_number() OVER () is the semantics, not the plan);
    //    the 4-dp canonical rounding of avg_logp is what makes the
    //    order (ties → doc_id) an exact cross-engine contract.
    QueryDef(
      "ext43_ppl_buckets",
      (s, d) => TextOps.perplexityBuckets(Tables.documents(s, d)),
      bench = true,
      sql = Some(s"""WITH tok AS (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
          |), tf AS (
          |  SELECT token, COUNT(*) AS cnt FROM tok GROUP BY 1
          |), tot AS (
          |  SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM tf
          |), scored AS (
          |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
          |         ${Sql.rnd(
             "(SUM(ln(CAST(cnt AS DOUBLE))) - COUNT(*) * ln(total)) / COUNT(*)", 4)}
          |           AS avg_logp
          |  FROM tok JOIN tf USING (token), tot
          |  GROUP BY doc_id, total
          |), ranked AS (
          |  SELECT doc_id, n_tokens, avg_logp,
          |         row_number() OVER (ORDER BY avg_logp DESC, doc_id) AS rn,
          |         COUNT(*) OVER () AS n
          |  FROM scored
          |)
          |SELECT doc_id, n_tokens, avg_logp,
          |       CAST((rn - 1) * 3 // n + 1 AS BIGINT) AS bucket,
          |       CASE WHEN (rn - 1) * 3 // n + 1 = 1 THEN 'head'
          |            WHEN (rn - 1) * 3 // n + 1 = 3 THEN 'tail'
          |            ELSE 'middle' END AS label
          |FROM ranked""".stripMargin)),

    // ── EXT44 — token-budget corpus mixing: fill each source's TOKEN
    //    quota in the EXT30 seeded-permutation order (training recipes
    //    are stated in tokens, not rows — row rates realize a token mix
    //    only in expectation). The budget-crossing doc is included
    //    (fill-to-at-least; packing trims overshoot downstream), a
    //    budget under the first doc still yields that doc, an absent
    //    source drops. src0 takes all (budget > corpus at this SF is
    //    fine — prefix = everything), src1 truncates, src2 crosses on
    //    its first docs; the permutation hash replays exactly in SQL.
    QueryDef(
      "ext44_token_mix",
      (s, d) => graft.ops.Sampling.tokenBudgetMix(
        Tables.documents(s, d), col("source"),
        Map("src0" -> 400L, "src1" -> 700L, "src2" -> 50L)),
      bench = true,
      sql = Some("""WITH t AS (
          |  SELECT doc_id, source,
          |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          |         ((doc_id % 1000000007)
          |            * ((42 * 2654435761) % 1000000006 + 1)
          |          + 42) % 1000000007 AS h
          |  FROM documents
          |), c AS (
          |  SELECT doc_id, source, n_tokens,
          |         COALESCE(SUM(n_tokens) OVER (PARTITION BY source
          |           ORDER BY h, doc_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
          |  FROM t
          |)
          |SELECT doc_id, source, n_tokens FROM c
          |WHERE bef < CASE source WHEN 'src0' THEN 400
          |                        WHEN 'src1' THEN 700
          |                        WHEN 'src2' THEN 50 ELSE 0 END""".stripMargin)))

  /** DuckDB mirror of [[graft.ops.Bpe.bpeMerges]] at merges = 3,
    * mechanically unrolled: stage r computes pair counts over v{r-1},
    * picks the argmax into t{r}, and rebuilds v{r} with the greedy
    * merge. Greedy left-to-right replay: occurrence positions of the
    * winning pair are grouped into consecutive runs (i − row_number
    * island key); within a run, odd positions merge (for x ≠ y every
    * run has length 1, so every occurrence merges — the two cases
    * unify). A merged position emits `lft || rgt`; the position after
    * a merged one is consumed; everything else passes through. */
  private def BpeOracleK3: String =
    BpeStagesK3 + """
      |SELECT CAST(merge_rank AS BIGINT) AS merge_rank, lft, rgt,
      |       CAST(pair_count AS BIGINT) AS pair_count
      |FROM (
      |  SELECT 1 AS merge_rank, lft, rgt, c AS pair_count FROM t1
      |  UNION ALL SELECT 2, lft, rgt, c FROM t2
      |  UNION ALL SELECT 3, lft, rgt, c FROM t3)""".stripMargin

  private def bpeStage(r: Int): String = {
    val pv = s"v${r - 1}"
      s"""p$r AS (
         |  SELECT s.syms[i] AS lft, s.syms[i + 1] AS rgt, SUM(s.cnt) AS c
         |  FROM $pv s, unnest(range(1, len(s.syms))) AS u(i)
         |  GROUP BY 1, 2
         |), t$r AS (
         |  SELECT lft, rgt, c FROM p$r ORDER BY c DESC, lft, rgt LIMIT 1
         |), occ$r AS (
         |  SELECT s.w, s.cnt, i, s.syms[i] AS sym, t.lft AS mlft, t.rgt AS mrgt,
         |         COALESCE(s.syms[i] = t.lft AND s.syms[i + 1] = t.rgt, FALSE) AS is_occ
         |  FROM $pv s CROSS JOIN t$r t, unnest(range(1, len(s.syms) + 1)) AS u(i)
         |), mg$r AS (
         |  SELECT w, cnt, i, sym, mlft, mrgt,
         |         CASE WHEN is_occ THEN
         |           (ROW_NUMBER() OVER (PARTITION BY w, is_occ, i - rn ORDER BY i) % 2 = 1)
         |         ELSE FALSE END AS merged
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY w, is_occ ORDER BY i) AS rn
         |        FROM occ$r)
         |), rb$r AS (
         |  SELECT w, cnt, i,
         |         CASE WHEN merged THEN mlft || mrgt
         |              WHEN COALESCE(LAG(merged) OVER (PARTITION BY w ORDER BY i), FALSE)
         |                THEN NULL
         |              ELSE sym END AS tokn
         |  FROM mg$r
         |), v$r AS (
         |  SELECT w, ANY_VALUE(cnt) AS cnt,
         |         list(tokn ORDER BY i) FILTER (WHERE tokn IS NOT NULL) AS syms
         |  FROM rb$r GROUP BY w
         |)""".stripMargin
  }

  /** The shared WITH-prefix of the BPE oracles: char-split vocabulary
    * v0 plus three unrolled merge stages ending at v3. */
  private def BpeStagesK3: String =
    """WITH w0 AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE w <> '' GROUP BY 1
      |), v0 AS (
      |  SELECT w, cnt, list_transform(range(1, length(w) + 1), i -> w[i]) AS syms
      |  FROM w0
      |), """.stripMargin +
      (1 to 3).map(bpeStage).mkString(", ")

  /** DuckDB mirror of [[graft.ops.QualityFunnel.filterFlags]]: integer
    * token stats + the ext35 LM score CTE, rules as the same exact
    * cross-multiplied inequalities. */
  private def FunnelFlagsCte: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
       |), tf AS (
       |  SELECT token, COUNT(*) AS cnt FROM tok GROUP BY 1
       |), tot AS (
       |  SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM tf
       |), lm AS (
       |  SELECT doc_id,
       |         ${Sql.rnd(
          "(SUM(ln(CAST(cnt AS DOUBLE))) - COUNT(*) * ln(total)) / COUNT(*)", 4)} AS avg_logp
       |  FROM tok JOIN tf USING (token), tot
       |  GROUP BY doc_id, total
       |), st AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
       |         CAST(len(list_filter(string_split(text, ' '),
       |           x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop
       |  FROM documents
       |), flags AS (
       |  SELECT st.doc_id,
       |         CAST(COALESCE(n_tokens >= 20 AND n_tokens <= 10000, FALSE) AS BIGINT)
       |           AS pass_len,
       |         CAST(COALESCE((n_tokens - n_distinct) * 100 <= n_tokens * 65, FALSE)
       |           AS BIGINT) AS pass_rep,
       |         CAST(COALESCE(n_stop * 50 >= n_tokens, FALSE) AS BIGINT) AS pass_stop,
       |         CAST(COALESCE(avg_logp >= -3.43, FALSE) AS BIGINT) AS pass_lm
       |  FROM st LEFT JOIN lm ON st.doc_id = lm.doc_id
       |)""".stripMargin

  /** Shared CTE prefix for the EXT33 lanes: L-gram occurrences via DuckDB
    * list slicing (0-based pos to match Spark's posexplode), then the
    * REDUNDANT occurrences — everything past each gram's first corpus
    * occurrence in (doc_id, pos) order. The oracle elects firsts with a
    * rank window; the engine uses the combinable min-struct aggregate
    * (SpanDedup.redundantOccurrences) — agreeing output proves the
    * aggregate path exact. */
  private def spanMarkCte(l: Int): String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), occ AS (
       |  SELECT doc_id, unnest(range(1, greatest(len(l) - $l + 2, 1))) AS g, l FROM d
       |), o2 AS (
       |  SELECT doc_id, CAST(g AS BIGINT) - 1 AS pos,
       |         array_to_string(l[g:g + $l - 1], ' ') AS gram
       |  FROM occ
       |), rn AS (
       |  SELECT doc_id, pos,
       |         ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
       |  FROM o2
       |), marked AS (
       |  SELECT doc_id, pos FROM rn WHERE rn > 1
       |)""".stripMargin
}
