package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.ext.{NearDup, Similarity}
import graft.ops.{Active911, Fixtures}

/** EXT query entries: near-dup detection, vector similarity, embedding
  * stats, and the full Active911 reference pipeline over built-in wire
  * fixtures. Entries without an oracle are non-SQL-expressible in DuckDB
  * (hash functions / LSH) — the driver records a rows-only check; their
  * semantics are pinned by ScalaTest specs instead.
  */
object Ext {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MinHash signatures + LSH candidate pressure per document.
    "q36_minhash" -> ((s, d) => {
      val signed = NearDup.signed(table(s, d, "documents").repartition(col("doc_id")), "doc_id", "text")
      val pairs = NearDup.candidatePairs(signed)
      val touched = pairs.select(col("id_a").as("doc_id"))
        .union(pairs.select(col("id_b").as("doc_id")))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_candidates"))
      signed.select(col("doc_id"), xxhash64(col("sig")).as("sig_hash"))
        .join(touched, Seq("doc_id"), "left")
        .select(col("doc_id"), col("sig_hash"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"))
        .orderBy(col("doc_id"))
    }),

    // SimHash per document (two-step so token hashes are computed once).
    "q37_simhash" -> ((s, d) => {
      table(s, d, "documents").repartition(col("doc_id"))
        .select(col("doc_id"), NearDup.tokenHashes(col("text")).as("hs"))
        .select(col("doc_id"), NearDup.simhashFromHashes(col("hs")).as("simhash"))
        .orderBy(col("doc_id"))
    }),

    // Top blocked n-gram-Jaccard pairs (lang + length-bucket blocking).
    "q38_jaccard_pairs" -> ((s, d) =>
      NearDup.blockedJaccardPairs(table(s, d, "documents"), 50)),

    // Embedding-cosine near-dup pairs (exact all-pairs baseline at
    // verify scale; graft.ext.Similarity.lshNearDupPairs is the banded
    // 100 TB path, recall-pinned against this in SimilaritySpec).
    "q39_embedding_neardup" -> ((s, d) => {
      val emb = table(s, d, "embeddings").repartition(col("vec_id"))
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.cosinePairsExact(emb, 0.4).orderBy(col("id_a"), col("id_b"))
    }),

    // IVF approximate top-3 (coarse-quantizer + inverted-list probe).
    // Rows-only: recall vs brute force pinned in SimilaritySpec.
    "q44_ann_ivf" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = emb.repartition(col("vec_id"))
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.ivfTopK(qs, corpus, 3).orderBy(col("qid"), col("rank"))
    }),

    // Exact cosine top-5 for the first 10 vectors (brute force, double
    // precision) — DuckDB oracle recomputes with the same math.
    "q40_cosine_topk" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = emb.repartition(col("vec_id"))
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.bruteTopK(qs, corpus, 5).orderBy(col("qid"), col("rank"))
    }),

    // Approximate top-3 via random-hyperplane LSH bucket probe.
    "q41_ann_lsh" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = emb.repartition(col("vec_id"))
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.lshTopK(qs, corpus, 3).orderBy(col("qid"), col("rank"))
    }),

    // Hybrid retrieval: metadata-filtered vector search (the RAG shape) —
    // corpus restricted to English documents via a doc_id=vec_id join
    // BEFORE the similarity scan, then exact cosine top-3 per query.
    // At scale the lang predicate prunes the corpus ahead of any
    // distance math; the filter composes with the IVF/LSH paths the same
    // way.
    "q47_hybrid_search" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      val en = table(s, d, "documents").filter(col("lang") === "en")
        .select(col("doc_id"))
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = emb.join(en, col("vec_id") === col("doc_id"))
        .repartition(col("vec_id"))
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.bruteTopK(qs, corpus, 3).orderBy(col("qid"), col("rank"))
    }),

    // Per-label embedding stats (norms in deterministic double math).
    "q42_embedding_stats" -> ((s, d) => {
      table(s, d, "embeddings")
        .select(col("label").cast("long").as("label"),
          Similarity.norm(col("embedding")).as("nrm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), round(avg(col("nrm")), 4).as("avg_norm"))
        .orderBy(col("label"))
    }),

    // Multimodal plumbing over synthetic binary payloads (documents text
    // bytes as stand-in media; decode/resize/features are deterministic
    // stubs — see graft.ext.Multimodal). Rows-only.
    "q51_multimodal" -> ((s, d) => {
      val media = table(s, d, "documents").repartition(col("doc_id"))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"),
          concat(lit("text/plain;src="), col("source")).as("mtype"))
      graft.ext.Multimodal.enrich(media, "doc_id", "bytes", "mtype")
        .select(col("media_id"), col("media_type"),
          col("resized.width").as("width"), col("resized.height").as("height"),
          col("decoded.n_bytes").as("n_bytes"),
          element_at(col("features"), 1).as("f0"),
          size(col("frames")).cast("long").as("n_frames"))
        .orderBy(col("media_id"))
    }),

    // The reference dataflow end-to-end on built-in wire fixtures
    // (SURVEY.md §7.2 minimum slice; golden parity in Active911Spec).
    "q50_active911_features" -> ((s, d) => {
      import s.implicits._
      val env = Fixtures.envelopes.toDF("agency_id", "raw")
      Active911.pipeline(env)
        .select(col("id"), col("type"),
          col("properties.callsign").as("callsign"),
          col("properties.start").as("start"),
          to_json(col("properties.links")).as("links_json"),
          col("properties.remarks").as("remarks"),
          element_at(col("geometry.coordinates"), 1).as("lon"),
          element_at(col("geometry.coordinates"), 2).as("lat"))
        .orderBy(col("id"))
    }))

  val oracles: Map[String, String] = Map(
    "q39_embedding_neardup" ->
      """WITH f AS (
           SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  CAST(unnest(embedding) AS DOUBLE) AS v
           FROM embeddings),
         norms AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM f GROUP BY vec_id),
         dots AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.v*b.v) AS dot
           FROM f a JOIN f b ON a.i = b.i AND a.vec_id < b.vec_id
           GROUP BY a.vec_id, b.vec_id),
         sims AS (
           SELECT d.id_a, d.id_b, d.dot / (na.nrm * nb.nrm) AS cos
           FROM dots d JOIN norms na ON d.id_a = na.vec_id
                       JOIN norms nb ON d.id_b = nb.vec_id)
         SELECT id_a, id_b, round(cos, 6) AS cos6 FROM sims
         WHERE cos >= 0.4 ORDER BY id_a, id_b""",
    "q47_hybrid_search" ->
      """WITH en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
         f AS (
           SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  CAST(unnest(embedding) AS DOUBLE) AS v
           FROM embeddings),
         norms AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM f GROUP BY vec_id),
         dots AS (
           SELECT a.vec_id AS qid, b.vec_id AS nid, sum(a.v*b.v) AS dot
           FROM f a JOIN f b ON a.i = b.i AND b.vec_id <> a.vec_id
           JOIN en ON b.vec_id = en.doc_id
           WHERE a.vec_id < 5 GROUP BY a.vec_id, b.vec_id),
         sims AS (
           SELECT d.qid, d.nid, d.dot / (na.nrm * nb.nrm) AS cos
           FROM dots d JOIN norms na ON d.qid = na.vec_id
                       JOIN norms nb ON d.nid = nb.vec_id),
         ranked AS (
           SELECT qid, nid,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS BIGINT) AS rank,
             round(cos, 6) AS cos6
           FROM sims)
         SELECT qid, nid, rank, cos6 FROM ranked
         WHERE rank <= 3 ORDER BY qid, rank""",
    "q40_cosine_topk" ->
      """WITH f AS (
           SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  CAST(unnest(embedding) AS DOUBLE) AS v
           FROM embeddings),
         norms AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM f GROUP BY vec_id),
         dots AS (
           SELECT a.vec_id AS qid, b.vec_id AS nid, sum(a.v*b.v) AS dot
           FROM f a JOIN f b ON a.i = b.i AND b.vec_id <> a.vec_id
           WHERE a.vec_id < 10 GROUP BY a.vec_id, b.vec_id),
         sims AS (
           SELECT d.qid, d.nid, d.dot / (na.nrm * nb.nrm) AS cos
           FROM dots d JOIN norms na ON d.qid = na.vec_id
                       JOIN norms nb ON d.nid = nb.vec_id),
         ranked AS (
           SELECT qid, nid,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS BIGINT) AS rank,
             round(cos, 6) AS cos6
           FROM sims)
         SELECT qid, nid, rank, cos6 FROM ranked
         WHERE rank <= 5 ORDER BY qid, rank""",
    "q42_embedding_stats" ->
      """WITH f AS (
           SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v
           FROM embeddings),
         norms AS (
           SELECT vec_id, any_value(label) AS label, sqrt(sum(v*v)) AS nrm
           FROM f GROUP BY vec_id)
         SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n,
           round(avg(nrm), 4) AS avg_norm
         FROM norms GROUP BY label ORDER BY label""")
}
