package graft.queries

/** DuckDB oracle SQL for the [[Curation]] query surface, split out of
  * Curation.scala for review tractability (the defs file alone was
  * approaching 4k lines). One entry per SQL-expressible query in
  * [[Curation.defs]]; keys must match exactly — the driver joins the two
  * maps by name. See Curation.scala's scaladoc for the oracle-authoring
  * rules (decimal anchoring, BIGINT casts, whitespace classes, µs time
  * anchoring) accumulated across rounds.
  */
object CurationOracles {

  /** q127/q134 oracle: the full BM25 replication (see the q127 map
    * comment) — shared because the indexed probe (q134) must
    * reproduce q127's relation exactly.
    */
  /** q144/q151 shared oracle: the whole char-trigram NB model in
    * SQL (planted markers, priors, add-one log-odds, argmax,
    * margin) — q151 scores against persisted model FILES and must
    * reproduce the identical relation.
    */
  private val LangIdOracleSql: String =
    """WITH d AS (
           SELECT doc_id, lang,
             text || ' ' || CASE lang
               WHEN 'en' THEN 'the of and to in that'
               WHEN 'de' THEN 'der die und das ist nicht'
               WHEN 'es' THEN 'el la de que y los'
               WHEN 'fr' THEN 'le la et les des une'
               WHEN 'zh' THEN 'de shi zai bu le wo'
               ELSE '' END AS text
           FROM documents),
         seed AS (SELECT lang, text FROM d WHERE doc_id < 200),
         cls AS (SELECT lang, count(*) AS nd FROM seed GROUP BY 1),
         nseed AS (SELECT CAST(sum(nd) AS BIGINT) AS n FROM cls),
         sg AS (
           SELECT lang, substring(text, CAST(i AS INTEGER), 3) AS gram
           FROM seed, unnest(range(1, length(text) - 1)) AS u(i)
           WHERE length(text) >= 3),
         cnt AS (SELECT gram, lang, count(*) AS c FROM sg GROUP BY 1, 2),
         vocab AS (SELECT DISTINCT gram FROM cnt),
         ctot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t
                  FROM cnt GROUP BY 1),
         vsize AS (SELECT count(*) AS v FROM vocab),
         w AS (
           SELECT vo.gram, cl.lang,
             ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE) / (ct.t + vs.v)) AS w
           FROM vocab vo CROSS JOIN cls cl
           JOIN ctot ct ON ct.lang = cl.lang
           CROSS JOIN vsize vs
           LEFT JOIN cnt c ON c.gram = vo.gram AND c.lang = cl.lang),
         tg AS (
           SELECT doc_id AS id, substring(text, CAST(i AS INTEGER), 3) AS gram
           FROM d, unnest(range(1, length(text) - 1)) AS u(i)
           WHERE doc_id >= 200 AND length(text) >= 3),
         sc AS (
           SELECT t.id, w.lang, count(*) AS n_grams, sum(w.w) AS sw
           FROM tg t JOIN w ON w.gram = t.gram GROUP BY 1, 2),
         pri AS (
           SELECT cl.lang, ln(CAST(cl.nd AS DOUBLE) / ns.n) AS prior
           FROM cls cl CROSS JOIN nseed ns),
         rk AS (
           SELECT sc.id, sc.lang, sc.n_grams, pri.prior + sc.sw AS score,
             row_number() OVER (PARTITION BY sc.id
               ORDER BY pri.prior + sc.sw DESC, sc.lang) AS rnk,
             lead(pri.prior + sc.sw) OVER (PARTITION BY sc.id
               ORDER BY pri.prior + sc.sw DESC, sc.lang) AS s2
           FROM sc JOIN pri ON pri.lang = sc.lang),
         pred AS (
           SELECT id, lang AS pred, CAST(n_grams AS BIGINT) AS n_grams,
             round(score, 4) AS score_r, round(score - s2, 4) AS margin_r
           FROM rk WHERE rnk = 1)
         SELECT d.lang, p.pred, count(*) AS n_docs,
           CAST(sum(p.n_grams) AS BIGINT) AS total_grams,
           round(avg(p.score_r), 3) AS avg_score,
           round(avg(p.margin_r), 3) AS avg_margin,
           round(min(p.margin_r), 4) AS min_margin
         FROM pred p JOIN d ON d.doc_id = p.id
         GROUP BY 1, 2 ORDER BY 1, 2"""

  /** The q127 BM25 relation over `documents WHERE <where>` — the same
    * SQL parameterized by a corpus predicate so the index-DELETION gate
    * (q155) can pin the post-delete probe against the anti-joined
    * corpus with the verbatim scoring arithmetic.
    */
  private def bm25OracleOver(where: String): String =
    bm25OracleOverCorpus(s"SELECT * FROM documents WHERE $where")

  /** The same relation over an ARBITRARY (doc_id, text) corpus SQL —
    * the q169 curate-then-index gate scores the first-arrival-deduped
    * stream with the verbatim arithmetic.
    */
  private def bm25OracleOverCorpus(corpusSql: String): String =
    s"""WITH corpus AS ($corpusSql),
         toks AS (
           SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS term
           FROM corpus),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         st AS (SELECT count(*) AS n_docs FROM corpus),
         tot AS (SELECT CAST(sum(tf) AS BIGINT) AS t FROM tf),
         q(query_id, query_text) AS (VALUES
           (CAST(1 AS BIGINT), 'spark window merge'),
           (CAST(2 AS BIGINT), 'customer filter join'),
           (CAST(3 AS BIGINT), 'hash scan order batch'),
           (CAST(4 AS BIGINT), 'vector data stream data'),
           (CAST(5 AS BIGINT), 'slow query table')),
         qterms AS (
           SELECT DISTINCT query_id, term FROM (
             SELECT query_id, unnest(list_filter(
               regexp_split_to_array(query_text, '\\s+'), x -> x <> '')) AS term
             FROM q)),
         scored AS (
           SELECT qt.query_id, tf.doc_id,
             sum(
               ln(1.0 + (st.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)) *
               (tf.tf * (1.2 + 1.0) /
                 (tf.tf + 1.2 * (1.0 - 0.75 +
                   0.75 * dl.dl / (tot.t * 1.0 / st.n_docs))))) AS score
           FROM qterms qt
           JOIN dfreq USING (term)
           JOIN tf USING (term)
           JOIN dl USING (doc_id)
           CROSS JOIN st CROSS JOIN tot
           GROUP BY 1, 2),
         ranked AS (
           SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id) AS rnk
           FROM scored)
         SELECT query_id, rnk, doc_id, round(score, 4) AS score
         FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk"""

  private val Bm25OracleSql: String = bm25OracleOver("true")

  /** The q167/q169 duplicate-bearing stream: documents in three phases
    * with planted cross-batch (phase-1/2 re-keys of earlier-phase
    * texts) and within-batch (phase-2 re-keys of phase-2 texts)
    * duplicates — ONE fragment shared by both oracles so the stream
    * construction cannot drift between the registry gate and the
    * curate-then-index gate.
    */
  private val DedupStreamSql: String =
    """SELECT doc_id, text, 0 AS ph FROM documents WHERE doc_id % 3 = 0
       UNION ALL
       SELECT doc_id, text, 1 FROM documents WHERE doc_id % 3 = 1
       UNION ALL
       SELECT doc_id + 1000000, text, 1 FROM documents
       WHERE doc_id % 3 = 0 AND doc_id % 5 = 0
       UNION ALL
       SELECT doc_id, text, 2 FROM documents WHERE doc_id % 3 = 2
       UNION ALL
       SELECT doc_id + 2000000, text, 2 FROM documents
       WHERE doc_id % 3 = 2 AND doc_id % 7 = 0
       UNION ALL
       SELECT doc_id + 3000000, text, 2 FROM documents
       WHERE doc_id % 3 = 1 AND doc_id % 4 = 0"""

  /** First-arrival survivors of [[DedupStreamSql]] — the registry's
    * documented total order: phase (batch) first, then id.
    */
  private val DedupAcceptedSql: String =
    s"""SELECT doc_id, text FROM (
         SELECT doc_id, text,
           row_number() OVER (PARTITION BY md5(text) ORDER BY ph, doc_id)
             AS rn
         FROM ($DedupStreamSql)) WHERE rn = 1"""



  /** q124 oracle: the ENTIRE MMR greedy selection unrolled in SQL (the
    * q35/q104 unroll pattern). sel1 is the pure-relevance pick; each selN
    * computes every unpicked candidate's penalty — max cosine to the
    * already-picked set — and takes the argmax of
    * `0.5*sim - 0.5*penalty` under the same (score DESC, id) total order
    * the engine uses. Cosines on both sides are the same index-order
    * accumulation (the q27 precedent), and the first pick's engine score
    * `0.5*sim - 0.5*0.0` is IEEE-identical to `0.5*sim`, so the whole
    * selection SEQUENCE and its scores replicate bit-for-bit.
    */
  private val MmrOracleSql: String = {
    val steps = (2 to 5).map { n =>
      val prev = (1 until n)
        .map(i => s"SELECT qid, id, v FROM sel$i").mkString(" UNION ALL ")
      s"""pen$n AS (
           SELECT c.qid, c.id, max(list_cosine_similarity(c.v, s.v)) AS mx
           FROM c0 c JOIN ($prev) s ON s.qid = c.qid
           WHERE NOT EXISTS (SELECT 1 FROM ($prev) x
                             WHERE x.qid = c.qid AND x.id = c.id)
           GROUP BY c.qid, c.id),
         sel$n AS (
           SELECT qid, id, v, score, $n AS rnk FROM (
             SELECT c.qid, c.id, c.v,
               0.5 * c.sim - 0.5 * p.mx AS score,
               row_number() OVER (PARTITION BY c.qid
                 ORDER BY 0.5 * c.sim - 0.5 * p.mx DESC, c.id) AS rn
             FROM c0 c JOIN pen$n p ON p.qid = c.qid AND p.id = c.id)
           WHERE rn = 1)"""
    }.mkString(",\n         ")
    s"""WITH q AS (
           SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
           FROM embeddings WHERE vec_id < 3),
         c0 AS (
           SELECT qid, id, sim, v FROM (
             SELECT qid, id, sim, v,
               row_number() OVER (PARTITION BY qid
                 ORDER BY sim DESC, id) AS rnk
             FROM (
               SELECT q.qid, e.vec_id AS id,
                 list_cosine_similarity(q.qvec,
                   CAST(e.embedding AS DOUBLE[])) AS sim,
                 CAST(e.embedding AS DOUBLE[]) AS v
               FROM q, embeddings e WHERE e.vec_id <> q.qid))
           WHERE rnk <= 20),
         sel1 AS (
           SELECT qid, id, v, score, 1 AS rnk FROM (
             SELECT qid, id, v, 0.5 * sim AS score,
               row_number() OVER (PARTITION BY qid
                 ORDER BY 0.5 * sim DESC, id) AS rn
             FROM c0)
           WHERE rn = 1),
         $steps,
         sel AS (
           ${(1 to 5).map(i => s"SELECT qid, id, score, rnk FROM sel$i")
             .mkString(" UNION ALL ")})
         SELECT qid, id, round(score, 4) AS score, rnk
         FROM sel ORDER BY qid, rnk"""
  }

  private val IvfOracleSql: String = {
    val d2 =
      """list_reduce(list_prepend(CAST(0 AS DOUBLE),
        [(s.v[i]-c.cv[i])*(s.v[i]-c.cv[i]) for i in range(1, 65)]),
        (acc, x) -> acc + x)"""
    val iters = (0 until 8).map { n =>
      s"""a$n AS (
           SELECT id, v, cell FROM (
             SELECT s.id, s.v, c.cell,
               row_number() OVER (PARTITION BY s.id
                 ORDER BY $d2 ASC, c.cell ASC) AS rn
             FROM samp s CROSS JOIN cents$n c)
           WHERE rn = 1),
         cents${n + 1} AS (
           SELECT c.cell,
             CASE WHEN g.vs IS NULL THEN c.cv
             ELSE [list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     [vv[i] for vv in g.vs]), (acc, x) -> acc + x) / len(g.vs)
                   for i in range(1, 65)]
             END AS cv
           FROM cents$n c LEFT JOIN (
             SELECT cell, list(v ORDER BY id) AS vs FROM a$n GROUP BY cell) g
           ON g.cell = c.cell)"""
    }.mkString(",\n         ")
    s"""WITH allv AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
         samp AS (
           -- md5(id)-ordered draw, mirroring trainIvfCentroids' unbiased
           -- deterministic sample (NOT the id-smallest prefix); rn is the
           -- position in the SAME order because the evenly-spread k-means
           -- init indexes into the collected (= md5-ordered) sample
           SELECT id, v,
             row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) AS rn
           FROM (SELECT id, v FROM allv
                 ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 4096)),
         nn AS (SELECT count(*) AS n FROM samp),
         cents0 AS (
           SELECT cl.cell, s.v AS cv
           FROM (SELECT unnest(range(0, 16)) AS cell) cl
           JOIN nn ON true
           JOIN samp s ON s.rn = (cl.cell * nn.n) // 16 + 1),
         $iters,
         cassign AS (
           SELECT id, v, cell FROM (
             SELECT s.id, s.v, c.cell,
               row_number() OVER (PARTITION BY s.id
                 ORDER BY $d2 ASC, c.cell ASC) AS rn
             FROM allv s CROSS JOIN cents8 c)
           WHERE rn = 1),
         probes AS (
           SELECT qid, qvec, cell FROM (
             SELECT s.id AS qid, s.v AS qvec, c.cell,
               row_number() OVER (PARTITION BY s.id
                 ORDER BY $d2 ASC, c.cell ASC) AS rn
             FROM allv s CROSS JOIN cents8 c WHERE s.id < 5)
           WHERE rn <= 4),
         cand AS (
           SELECT p.qid, p.qvec, ca.id, ca.v AS vec
           FROM probes p JOIN cassign ca ON ca.cell = p.cell
           WHERE p.qid <> ca.id),
         sc AS (
           SELECT qid, id, list_cosine_similarity(qvec, vec) AS sim
           FROM cand),
         r AS (
           SELECT qid, id, sim,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id)
               AS INTEGER) AS rnk
           FROM sc WHERE sim IS NOT NULL)
         SELECT qid, id, round(sim, 4) AS sim, rnk
         FROM r WHERE rnk <= 10 ORDER BY qid, rnk"""
  }

  private val SpanDedupOracleSql: String =
        """WITH planted AS (
             SELECT doc_id, source,
               concat_ws(' ',
                 CASE WHEN doc_id % 7 = 0 THEN
                   'redistribution and use in source and binary forms are permitted' END,
                 text,
                 CASE WHEN doc_id % 11 = 0 THEN
                   'redistribution and use in source and binary forms are permitted' END)
                 AS text
             FROM documents),
           toks AS (
             SELECT doc_id, source,
               list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS tk
             FROM planted),
           grams AS (
             SELECT doc_id, pos,
               array_to_string(tk[pos : pos + 3], ' ') AS gram
             FROM (SELECT doc_id, tk,
                     unnest(range(1, len(tk) - 4 + 2)) AS pos
                   FROM toks WHERE len(tk) >= 4)),
           freq AS (
             SELECT gram FROM grams GROUP BY gram HAVING count(*) > 2),
           hits AS (
             SELECT doc_id, list_sort(list(pos)) AS ps
             FROM grams JOIN freq USING (gram) GROUP BY doc_id),
           cov AS (
             SELECT t.doc_id, t.source, t.tk,
               coalesce(h.ps, CAST([] AS BIGINT[])) AS ps,
               list_distinct(flatten(
                 [range(p, p + 4) for p in coalesce(h.ps, CAST([] AS BIGINT[]))]))
                 AS covered
             FROM toks t LEFT JOIN hits h USING (doc_id)),
           per_doc AS (
             SELECT doc_id, source,
               CAST(len(covered) AS BIGINT) AS n_dup,
               CAST(CASE WHEN len(ps) = 0 THEN 0
                 ELSE 1 + len([i for i in range(2, len(ps) + 1)
                               if ps[i] - ps[i - 1] > 4]) END AS BIGINT) AS n_spans,
               coalesce(array_to_string(
                 [tk[i] for i in range(1, len(tk) + 1)
                  if NOT list_contains(covered, i)], ' '), '') AS clean
             FROM cov)
           SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN n_dup > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_affected,
             CAST(sum(n_dup) AS BIGINT) AS n_dup_tokens,
             CAST(sum(n_spans) AS BIGINT) AS n_spans,
             CAST(sum(length(clean)) AS BIGINT) AS clean_chars,
             count(DISTINCT md5(clean)) AS n_distinct_clean
           FROM per_doc GROUP BY source ORDER BY source"""

  private val base: Map[String, String] = Map(
    "q20_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(round(CAST(CAST(sum(len(list_filter(
             regexp_split_to_array(text, '\s+'), x -> x <> ''))) AS DOUBLE)
           / count(*) AS DECIMAL(38,10)), 4) AS DOUBLE) AS avg_tokens,
         CAST(round(CAST(CAST(sum(length(text)) AS DOUBLE)
           / count(*) AS DECIMAL(38,10)), 4) AS DOUBLE) AS avg_chars
         FROM documents GROUP BY lang ORDER BY lang""",
    "q21_quality" ->
      """WITH m AS (
           SELECT lang,
             len(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS nt,
             len(list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> ''))) AS ndt,
             length(text) AS nc,
             length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
           FROM documents)
         SELECT lang, round(avg(
           least(1.0, nt / 20.0) * 0.4 +
           (CASE WHEN nt = 0 THEN 0.0 ELSE ndt * 1.0 / nt END) * 0.4 +
           (CASE WHEN nc = 0 THEN 1.0 ELSE np * 1.0 / nc END) * 0.2), 4)
           AS avg_quality
         FROM m GROUP BY lang ORDER BY lang""",
    "q22_langid" ->
      """WITH m AS (
           SELECT lang,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
               AS toks
           FROM documents),
         scored AS (
           SELECT lang,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE len(list_filter(toks, x -> x IN
                    ('the','a','of','to','and','is','in','that','it','for')))
                    * 1.0 / len(toks) END AS r
           FROM m)
         SELECT lang,
           CASE WHEN r >= 0.08 THEN 'en' ELSE 'und' END AS lang_pred,
           count(*) AS n
         FROM scored GROUP BY lang, lang_pred ORDER BY lang, lang_pred""",
    "q23_dedup_exact" ->
      """SELECT source, count(*) AS n_docs,
         count(DISTINCT md5(text)) AS n_unique
         FROM documents GROUP BY source ORDER BY source""",
    "q26_jaccard_pairs" ->
      """WITH d AS (
           SELECT lang, doc_id,
             list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS sh
           FROM documents),
         pairs AS (
           SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.sh, b.sh)) * 1.0 /
               len(list_distinct(list_concat(a.sh, b.sh))) AS j
           FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id)
         SELECT lang, id_a, id_b, round(j, 4) AS jaccard
         FROM pairs WHERE j >= 0.5 ORDER BY lang, id_a, id_b""",
    "q27_knn_brute" ->
      """WITH q AS (
           SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
           FROM embeddings WHERE vec_id < 5),
         c AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
         s AS (
           SELECT qid, id, list_cosine_similarity(qvec, vec) AS sim
           FROM q, c WHERE qid <> id),
         r AS (
           SELECT qid, id, sim,
             CAST(row_number() OVER (
               PARTITION BY qid ORDER BY sim DESC, id) AS INTEGER) AS rnk
           FROM s)
         SELECT qid, id, round(sim, 4) AS sim, rnk
         FROM r WHERE rnk <= 10 ORDER BY qid, rnk""",
    "q36_emb_neardup" ->
      """WITH e AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 4) AS sim
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.v, b.v) >= 0.9
         ORDER BY id_a, id_b""",
    "q29_emb_stats" ->
      """SELECT label, count(*) AS n,
         round(avg(sqrt(list_sum(list_transform(
           CAST(embedding AS DOUBLE[]), x -> x * x)))), 4) AS avg_norm
         FROM embeddings GROUP BY label ORDER BY label""",
    "q30_multimodal_bytes" ->
      """SELECT source,
         CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         count(*) AS n
         FROM documents GROUP BY source ORDER BY source""",
    // The sampling oracles replicate Sampling.uniformKey exactly: top 32
    // bits of md5('salt:' || key) over 2^32 — the division by a power of
    // two is exact in IEEE double, so the threshold compares agree
    // bit-for-bit across engines.
    "q42_hash_split" ->
      """WITH u AS (
           SELECT *,
             CAST(concat('0x', substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
               / 4294967296.0 AS u
           FROM documents)
         SELECT CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split,
                count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM u GROUP BY 1 ORDER BY split""",
    "q43_stratified_sample" ->
      """WITH u AS (
           SELECT *,
             CAST(concat('0x', substr(md5(concat('strat:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
               / 4294967296.0 AS u
           FROM documents)
         SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM u
         WHERE u < CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 0.25 ELSE 0.1 END
         GROUP BY lang ORDER BY lang""",
    // DuckDB compares µs-truncated timestamps while Spark compares the raw
    // ns longs; equivalent here because every events.ts is µs-aligned
    // (verified at all SFs) and the window bound is a whole number of µs.
    "q44_range_join" ->
      """SELECT p.event_id AS p_id, count(*) AS n_clicks,
                min(c.event_id) AS min_click_id
         FROM events p JOIN events c
           ON c.ts >= p.ts AND c.ts < p.ts + INTERVAL 5 MINUTE
         WHERE p.event_type = 'purchase' AND c.event_type = 'click'
         GROUP BY p.event_id ORDER BY p_id""",
    "q46_tfidf" ->
      """WITH docs AS (SELECT * FROM documents WHERE doc_id < 100),
         toks AS (
           SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(text, '\s+'), x -> x <> '')) AS term
           FROM docs),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM docs),
         scored AS (
           SELECT tf.doc_id, tf.term,
             tf.tf * ln(n.n_docs * 1.0 / dfreq.df) AS score
           FROM tf JOIN dfreq USING (term) CROSS JOIN n),
         ranked AS (
           SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term) AS rnk
           FROM scored)
         SELECT doc_id, rnk, term, round(score, 4) AS score
         FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""",
    "q45_curation_pipeline" ->
      """WITH m AS (
           SELECT doc_id, text,
             len(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS nt,
             len(list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> ''))) AS ndt,
             length(text) AS nc,
             length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
           FROM documents),
         scored AS (
           SELECT doc_id, text,
             least(1.0, nt / 20.0) * 0.4 +
             (CASE WHEN nt = 0 THEN 0.0 ELSE ndt * 1.0 / nt END) * 0.4 +
             (CASE WHEN nc = 0 THEN 1.0 ELSE np * 1.0 / nc END) * 0.2 AS q
           FROM m),
         gated AS (SELECT * FROM scored WHERE q >= 0.75),
         deduped AS (
           SELECT * FROM gated
           QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)
         SELECT
           CASE WHEN CAST(concat('0x', substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                  / 4294967296.0 < 0.9 THEN 'train' ELSE 'eval' END AS split,
           count(*) AS n, round(avg(q), 4) AS avg_quality
         FROM deduped GROUP BY 1 ORDER BY split""",
    // The gate checks for the hash-defined operators pin the expected
    // EMPTY relation: the Spark side emits the by-construction-impossible
    // rows (see the q38-q41 definitions), so any soundness bug surfaces as
    // a row/hash mismatch against these.
    "q47_sketch_bounds" ->
      """SELECT CAST(NULL AS VARCHAR) AS event_type WHERE false""",
    "q38_minhash_sound" ->
      """SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b
         WHERE false""",
    "q39_simhash_complete" ->
      """SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b
         WHERE false""",
    "q40_ann_lsh_sound" ->
      """SELECT CAST(NULL AS BIGINT) AS qid, CAST(NULL AS BIGINT) AS id,
         CAST(NULL AS DOUBLE) AS sim
         WHERE false""",
    "q41_ann_ivf_sound" ->
      """SELECT CAST(NULL AS BIGINT) AS qid, CAST(NULL AS BIGINT) AS id,
         CAST(NULL AS DOUBLE) AS sim
         WHERE false""",
    // The portable MinHash replicated end-to-end: per-shingle digest pair
    // (poly257/poly263 char folds, the q56 idiom), the 64-member family
    // minima, band collision as SLICE EQUALITY over the 16 x 4 signature
    // layout (the engine's murmur bucket of the same slice is injective up
    // to 2^-32), then exact distinct-set Jaccard >= 0.4 (q26's idiom).
    "q24_minhash_lsh" ->
      """WITH toks AS (
           SELECT doc_id AS id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         sh AS (
           SELECT id,
             list_distinct([array_to_string(l[i:i+1], ' ')
                            for i in range(1, len(l))]) AS sh
           FROM toks WHERE len(l) >= 2),
         hs AS (
           SELECT id, sh,
             [ { 'h1': list_reduce([CAST(unicode(s[j]) AS BIGINT)
                                    for j in range(1, len(s)+1)],
                                   (a, b) -> (a * 257 + b) % 2147483647),
                 'h2': list_reduce([CAST(unicode(s[j]) AS BIGINT)
                                    for j in range(1, len(s)+1)],
                                   (a, b) -> (a * 263 + b) % 2147483647) }
               for s in sh ] AS th
           FROM sh),
         sig AS (
           SELECT id, sh,
             [ list_min([ ((2*i+3) * t.h1 + (7*i*i+11) * t.h2 + 31*i + 7)
                          % 2147483647 for t in th ])
               for i in range(0, 64) ] AS sg
           FROM hs),
         cand AS (
           SELECT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
           FROM sig a JOIN sig b ON a.id < b.id
           WHERE len(list_filter(range(0, 16),
                 b2 -> a.sg[b2*4+1:b2*4+4] = b.sg[b2*4+1:b2*4+4])) > 0)
         SELECT id_a, id_b,
           round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE) /
                 (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))), 4)
             AS jaccard
         FROM cand
         WHERE CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE) /
               (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))) >= 0.4
         ORDER BY id_a, id_b""",
    // The portable SimHash: per-token digest pair, bit j from the parity
    // of family member j, fingerprint kept as a 64-element bit list (so
    // bit 63 never has to ride a signed BIGINT), Hamming by elementwise
    // compare over ALL pairs — no blocking needed because the engine's
    // chunk blocking is pigeonhole-complete at radius 3 (its output IS
    // the full relation).
    "q25_simhash" ->
      """WITH toks AS (
           SELECT doc_id AS id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         hs AS (
           SELECT id,
             [ { 'h1': list_reduce([CAST(unicode(t[j]) AS BIGINT)
                                    for j in range(1, len(t)+1)],
                                   (a, b) -> (a * 257 + b) % 2147483647),
                 'h2': list_reduce([CAST(unicode(t[j]) AS BIGINT)
                                    for j in range(1, len(t)+1)],
                                   (a, b) -> (a * 263 + b) % 2147483647) }
               for t in l ] AS th
           FROM toks),
         bits AS (
           SELECT id,
             [ CASE WHEN list_sum([ CASE WHEN
                   (((2*j+3) * t.h1 + (7*j*j+11) * t.h2 + 31*j + 7)
                    % 2147483647) % 2 = 1
                   THEN 1 ELSE -1 END for t in th ]) > 0 THEN 1 ELSE 0 END
               for j in range(0, 64) ] AS b
           FROM hs)
         SELECT a.id AS id_a, b.id AS id_b,
           CAST(list_sum([CASE WHEN a.b[i] <> b.b[i] THEN 1 ELSE 0 END
                          for i in range(1, 65)]) AS INTEGER) AS hamming
         FROM bits a JOIN bits b ON a.id < b.id
         WHERE list_sum([CASE WHEN a.b[i] <> b.b[i] THEN 1 ELSE 0 END
                         for i in range(1, 65)]) <= 3
         ORDER BY id_a, id_b""",
    // The portable hyperplane LSH: all 5120 plane components regenerated
    // from their "hp|42|g" digests, per-vector 8 x 10-bit sign keys via
    // ordered dot-product folds, candidates where any table's keys are
    // within one bit flip (radius-1 multiprobe), exact-cosine rerank
    // (q27's idiom).
    "q28_ann_lsh" ->
      """WITH pl AS (
           SELECT [CAST(list_reduce(
                     [CAST(unicode(('hp|42|' || CAST(g AS VARCHAR))[j]) AS BIGINT)
                      for j in range(1, len('hp|42|' || CAST(g AS VARCHAR))+1)],
                     (a, b) -> (a * 257 + b) % 2147483647) - 1073741823
                   AS DOUBLE)
                   for g in range(0, 5120)] AS p),
         v AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
         keys AS (
           SELECT id, vec,
             [ list_sum([ CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     [vec[i] * p[(t*10+j)*64 + i] for i in range(1, 65)]),
                     (a, x) -> a + x) > 0
                   THEN CAST(2 ** j AS BIGINT) ELSE 0 END
                 for j in range(0, 10) ])
               for t in range(0, 8) ] AS ks
           FROM v, pl),
         cand AS (
           SELECT q.id AS qid, c.id AS id, q.vec AS qvec, c.vec AS vec
           FROM keys q JOIN keys c ON q.id <> c.id
           WHERE q.id < 5
             AND len(list_filter(range(1, 9),
                   t -> bit_count(xor(q.ks[t], c.ks[t])) <= 1)) > 0),
         s AS (
           SELECT qid, id, list_cosine_similarity(qvec, vec) AS sim
           FROM cand),
         r AS (
           SELECT qid, id, sim,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id)
               AS INTEGER) AS rnk
           FROM s WHERE sim IS NOT NULL)
         SELECT qid, id, round(sim, 4) AS sim, rnk
         FROM r WHERE rnk <= 10 ORDER BY qid, rnk""",
    "q35_ann_ivf" -> IvfOracleSql,
    // Positional n-grams in DuckDB via list comprehension over the token
    // list; all outputs are exact integer sums (see the q48 def comment).
    "q48_repetition" ->
      """WITH t AS (
           SELECT doc_id, lang,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         w AS (
           SELECT doc_id, term, count(*) AS c
           FROM (SELECT doc_id, unnest(l) AS term FROM t)
           GROUP BY doc_id, term),
         ws AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                  count(*) AS n_distinct_words, max(c) AS max_word_count
           FROM w GROUP BY doc_id),
         b AS (
           SELECT doc_id, gram, count(*) AS c
           FROM (SELECT doc_id,
                   unnest([l[i] || ' ' || l[i+1] for i in range(1, len(l))]) AS gram
                 FROM t)
           GROUP BY doc_id, gram),
         bs AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                  count(*) AS n_distinct_bigrams
           FROM b GROUP BY doc_id),
         s AS (
           SELECT t.doc_id, t.lang,
                  ws.n_tokens, ws.n_distinct_words, ws.max_word_count,
                  coalesce(bs.n_bigrams, 0) AS n_bigrams,
                  coalesce(bs.n_distinct_bigrams, 0) AS n_distinct_bigrams
           FROM t JOIN ws USING (doc_id) LEFT JOIN bs USING (doc_id))
         SELECT lang, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                CAST(sum(n_tokens - n_distinct_words) AS BIGINT) AS total_dup_words,
                CAST(sum(n_bigrams - n_distinct_bigrams) AS BIGINT) AS total_dup_bigrams,
                CAST(sum(CASE WHEN max_word_count * 100 > n_tokens * 20
                           OR (n_bigrams - n_distinct_bigrams) * 100 > n_bigrams * 20
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
         FROM s GROUP BY lang ORDER BY lang""",
    "q49_heavy_ngrams" ->
      """WITH t AS (
           SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         g AS (
           SELECT unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
                          for i in range(1, len(l) - 1)]) AS gram
           FROM t)
         SELECT gram, count(*) AS n_occurrences
         FROM g GROUP BY gram
         HAVING count(*) >= 2
         ORDER BY n_occurrences DESC, gram
         LIMIT 20""",
    // Token counts replicate TextAnalysis.tokenCount (whitespace split,
    // empties removed); the pack assignment is the same integer window
    // formula as Packing.packSequences.
    "q51_seq_packing" ->
      """WITH d AS (
           SELECT doc_id, doc_id % 8 AS shard,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
               AS n_toks
           FROM documents),
         p AS (
           SELECT shard, n_toks,
             CAST((sum(n_toks) OVER w - n_toks) // 512 AS BIGINT) AS pack
           FROM d
           WINDOW w AS (PARTITION BY shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING)),
         packs AS (
           SELECT shard, pack, count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS pack_tokens,
             greatest(CAST(sum(n_toks) AS BIGINT) - 512, 0)
               AS overflow_tokens
           FROM p GROUP BY shard, pack)
         SELECT shard, count(*) AS n_packs,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(pack_tokens) AS BIGINT) AS total_tokens,
           max(pack_tokens) AS max_pack_tokens,
           CAST(sum(overflow_tokens) AS BIGINT) AS total_overflow
         FROM packs GROUP BY shard ORDER BY shard""",
    "q54_semdedup_sound" ->
      """SELECT CAST(NULL AS BIGINT) AS bad WHERE false""",
    "q59_ivf_index_parity" ->
      """SELECT CAST(NULL AS BIGINT) AS qid, CAST(NULL AS BIGINT) AS id,
         CAST(NULL AS DOUBLE) AS sim, CAST(NULL AS INTEGER) AS rank
         WHERE false""",
    // Same winnow CTE as q56, then the inverted-index self-join on
    // (lang, fingerprint) with the stop-fingerprint cap.
    "q58_passage_matches" ->
      """WITH toks AS (
           SELECT lang, doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         grams AS (
           SELECT lang, doc_id,
             [array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)] AS gs
           FROM toks),
         hashes AS (
           SELECT lang, doc_id,
             [list_reduce([CAST(unicode(g[j]) AS BIGINT)
                           for j in range(1, length(g)+1)],
                          (a, b) -> (a * 257 + b) % 2147483647)
              for g in gs] AS hs
           FROM grams),
         winnowed AS (
           SELECT lang, doc_id,
             CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
                  WHEN len(hs) <= 4 THEN [list_min(hs)]
                  ELSE [list_min(hs[i:i+3]) for i in range(1, len(hs) - 2)]
             END AS mins
           FROM hashes),
         fp AS (
           SELECT lang, doc_id, unnest(list_distinct(mins)) AS fp
           FROM winnowed),
         rare AS (
           SELECT lang, fp FROM fp GROUP BY lang, fp HAVING count(*) <= 100),
         keyed AS (
           SELECT f.lang, f.doc_id, f.fp
           FROM fp f JOIN rare r ON f.lang = r.lang AND f.fp = r.fp)
         SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) AS n_shared
         FROM keyed a JOIN keyed b
           ON a.lang = b.lang AND a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY a.lang, id_a, id_b HAVING count(*) >= 2
         ORDER BY a.lang, id_a, id_b""",
    // Chunk explosion via generate_series; integer ceil-division with
    // DuckDB's // operator. Sums cast to BIGINT per the HUGEINT rule.
    "q57_chunking" ->
      """WITH toks AS (
           SELECT doc_id, lang,
             CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS BIGINT) AS n_toks
           FROM documents),
         chunks AS (
           SELECT doc_id, lang, n_toks, unnest(generate_series(
             CAST(0 AS BIGINT), (n_toks + 63) // 64 - 1)) AS chunk
           FROM toks WHERE n_toks > 0),
         sized AS (
           SELECT doc_id, lang, chunk,
             least(64, n_toks - chunk * 64) AS chunk_tokens
           FROM chunks)
         SELECT lang,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_chunks,
           CAST(sum(chunk_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN chunk_tokens = 64 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_full,
           CAST(max(chunk) AS BIGINT) AS max_chunk_idx
         FROM sized GROUP BY lang ORDER BY lang""",
    // Replicates the winnowing sketch end-to-end: the same polynomial
    // rolling hash over code points ((h*257 + cp) mod 2^31-1 — spaces
    // included between gram words; list_reduce's first-element seed equals
    // the fold-from-0 since 0*257+c = c), the same window-of-4 minima
    // (fewer than 4 gram hashes -> single global min), the same
    // distinctness. Integer sums cast to BIGINT per the HUGEINT rule.
    "q56_winnow_fingerprints" ->
      """WITH toks AS (
           SELECT lang, doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         grams AS (
           SELECT lang, doc_id,
             [array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)] AS gs
           FROM toks),
         hashes AS (
           SELECT lang, doc_id,
             [list_reduce([CAST(unicode(g[j]) AS BIGINT)
                           for j in range(1, length(g)+1)],
                          (a, b) -> (a * 257 + b) % 2147483647)
              for g in gs] AS hs
           FROM grams),
         winnowed AS (
           SELECT lang, doc_id,
             CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
                  WHEN len(hs) <= 4 THEN [list_min(hs)]
                  ELSE [list_min(hs[i:i+3]) for i in range(1, len(hs) - 2)]
             END AS mins
           FROM hashes),
         fp AS (
           SELECT lang, doc_id, list_distinct(mins) AS f FROM winnowed)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(len(f)) AS BIGINT) AS n_fingerprints,
           CAST(sum(coalesce(list_aggregate(f, 'sum'), 0)) AS BIGINT) AS fp_sum
         FROM fp GROUP BY lang ORDER BY lang""",
    // Components via recursive CTE: `reach` enumerates (node, label) for
    // every label reachable from the node; min per node = the component.
    // Pair relation is byte-identical to q26's oracle.
    "q53_dedup_clusters" ->
      """WITH RECURSIVE d AS (
           SELECT lang, doc_id,
             list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS sh
           FROM documents),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
             len(list_distinct(list_concat(a.sh, b.sh))) >= 0.95),
         edges AS (
           SELECT id_a AS s, id_b AS t FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT DISTINCT s AS id, s AS label FROM edges
           UNION
           SELECT e.s AS id, r.label FROM edges e JOIN reach r ON r.id = e.t),
         comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
         sizes AS (
           SELECT doc.lang, c.component, count(*) AS sz
           FROM comp c JOIN documents doc ON c.id = doc.doc_id
           GROUP BY doc.lang, c.component)
         SELECT lang, CAST(sum(sz) AS BIGINT) AS n_docs_in_clusters,
           count(*) AS n_clusters, max(sz) AS max_cluster
         FROM sizes GROUP BY lang ORDER BY lang""",
    // Composed from the proven q48/q50/q42/q51 oracle stages.
    "q52_train_pipeline" ->
      """WITH t AS (
           SELECT doc_id, source,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         w AS (
           SELECT doc_id, term, count(*) AS c
           FROM (SELECT doc_id, unnest(l) AS term FROM t)
           GROUP BY doc_id, term),
         ws AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                  count(*) AS n_distinct_words, max(c) AS max_word_count
           FROM w GROUP BY doc_id),
         b AS (
           SELECT doc_id, gram, count(*) AS c
           FROM (SELECT doc_id,
                   unnest([l[i] || ' ' || l[i+1] for i in range(1, len(l))]) AS gram
                 FROM t)
           GROUP BY doc_id, gram),
         bs AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                  count(*) AS n_distinct_bigrams
           FROM b GROUP BY doc_id),
         clean AS (
           SELECT t.doc_id, t.l FROM t
           JOIN ws USING (doc_id) LEFT JOIN bs USING (doc_id)
           WHERE NOT (ws.max_word_count * 100 > ws.n_tokens * 20
             OR (coalesce(bs.n_bigrams, 0) - coalesce(bs.n_distinct_bigrams, 0)) * 100
                > coalesce(bs.n_bigrams, 0) * 20)),
         g4 AS (
           SELECT doc_id,
             unnest(list_distinct(
               [l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
                for i in range(1, len(l) - 2)])) AS gram
           FROM t),
         bench AS (SELECT DISTINCT gram FROM g4 WHERE doc_id % 17 = 0),
         contaminated AS (
           SELECT DISTINCT g4.doc_id FROM g4 JOIN bench USING (gram)
           WHERE g4.doc_id % 17 <> 0),
         decont AS (
           SELECT doc_id, len(l) AS n_toks FROM clean
           WHERE doc_id % 17 <> 0
             AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
         train AS (
           SELECT doc_id, n_toks, doc_id % 4 AS shard FROM decont
           WHERE CAST(concat('0x', substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                   / 4294967296.0 < 0.9),
         p AS (
           SELECT shard,
             CAST((sum(n_toks) OVER win - n_toks) // 512 AS BIGINT) AS pack,
             n_toks
           FROM train
           WINDOW win AS (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING)),
         packs AS (
           SELECT shard, pack, count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS pack_tokens
           FROM p GROUP BY shard, pack)
         SELECT shard, count(*) AS n_packs,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(pack_tokens) AS BIGINT) AS total_tokens
         FROM packs GROUP BY shard ORDER BY shard""",
    "q60_bloom_decontam_sound" ->
      """SELECT CAST(NULL AS BIGINT) AS id WHERE false""",
    "q62_exact_k_sample" ->
      """WITH u AS (
           SELECT doc_id, lang,
             CAST(concat('0x', substr(md5(concat('exactk:',
               CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
               / 4294967296.0 AS u
           FROM documents),
         r AS (
           SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rk
           FROM u)
         SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM r WHERE rk <= 40 GROUP BY lang ORDER BY lang""",
    "q63_normalized_dedup" ->
      """WITH n AS (
           SELECT doc_id, source,
             trim(regexp_replace(regexp_replace(lower(text),
               '[[:punct:]]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
           FROM documents),
         r AS (
           SELECT doc_id, source,
             row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rk
           FROM n)
         SELECT source, count(*) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM r WHERE rk = 1 GROUP BY source ORDER BY source""",
    "q61_quality_cut" ->
      """WITH m AS (
           SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS nt,
             len(list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> x <> ''))) AS ndt,
             length(text) AS nc,
             length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
           FROM documents),
         k AS (
           SELECT doc_id, lang,
             (CASE WHEN nt = 0 THEN 0
                   ELSE least(nt, 20) * 20 + (ndt * 400) // nt END)
             + (CASE WHEN nc = 0 THEN 200 ELSE (np * 200) // nc END) AS qkey
           FROM m),
         r AS (
           SELECT doc_id, lang, qkey,
             row_number() OVER (PARTITION BY lang
                                ORDER BY qkey DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
           FROM k)
         SELECT lang, count(*) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(min(qkey) AS BIGINT) AS min_kept_key
         FROM r WHERE rk * 4 <= n * 3
         GROUP BY lang ORDER BY lang""",
    "q50_decontam" ->
      """WITH t AS (
           SELECT doc_id, source,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         g AS (
           SELECT doc_id, source,
             unnest(list_distinct(
               [l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
                for i in range(1, len(l) - 2)])) AS gram
           FROM t),
         bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0),
         c AS (
           SELECT DISTINCT doc_id, source
           FROM g JOIN bench USING (gram)
           WHERE doc_id % 17 <> 0)
         SELECT source, count(*) AS n_contaminated
         FROM c GROUP BY source ORDER BY source""",
    // Same PII plant as the Spark side; the three patterns are verbatim
    // the operator's (Java-regex/RE2 common subset). DuckDB regexp_replace
    // needs the 'g' flag to match Spark's replace-all semantics.
    "q64_pii" ->
      """WITH planted AS (
           SELECT source,
             text ||
             CASE WHEN doc_id % 5 = 0
               THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
               ELSE '' END ||
             CASE WHEN doc_id % 7 = 0
               THEN ' host 10.' || CAST(doc_id % 250 AS VARCHAR) || '.0.' ||
                 CAST(doc_id % 200 AS VARCHAR)
               ELSE '' END ||
             CASE WHEN doc_id % 11 = 0
               THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
                 '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               ELSE '' END AS text
           FROM documents),
         s AS (
           SELECT source,
             len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             len(regexp_extract_all(text,
               '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b')) AS n_ips,
             len(regexp_extract_all(text,
               '\+?[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
             regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b', '<IP>', 'g'),
               '\+?[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS red
           FROM planted)
         SELECT source,
           CAST(sum(CASE WHEN n_emails + n_ips + n_phones > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_docs_with_pii,
           CAST(sum(n_emails) AS BIGINT) AS n_emails,
           CAST(sum(n_ips) AS BIGINT) AS n_ips,
           CAST(sum(n_phones) AS BIGINT) AS n_phones,
           CAST(sum(length(red)) AS BIGINT) AS redacted_chars,
           CAST(sum(
             len(regexp_extract_all(red,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) +
             len(regexp_extract_all(red,
               '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b')) +
             len(regexp_extract_all(red,
               '\+?[0-9]{3}-[0-9]{3}-[0-9]{4}'))) AS BIGINT) AS residual_pii
         FROM s GROUP BY source ORDER BY source""",
    // Replicates Sampling.deterministicShuffle exactly: u32 = top 32 md5
    // bits, shard = u32 * 8 // 2^32, pos = rank within shard by (u32, id).
    "q65_corpus_shuffle" ->
      """WITH keyed AS (
           SELECT doc_id,
             CAST(concat('0x', substr(md5(concat('shuffle:',
               CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) AS u32
           FROM documents),
         sharded AS (
           SELECT doc_id, u32, (u32 * 8) // 4294967296 AS shard FROM keyed),
         p AS (
           SELECT shard, doc_id,
             row_number() OVER (PARTITION BY shard ORDER BY u32, doc_id) - 1
               AS pos
           FROM sharded)
         SELECT shard, count(*) AS n,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(pos * doc_id) AS BIGINT) AS order_checksum
         FROM p GROUP BY shard ORDER BY shard""",
    // Replicates Sampling.temperatureTargets + temperatureResample:
    // weight = floor(sqrt(n)), target = least(n, 2000*w // sum(w)),
    // kept = first target rows by (md5 u32, id) per source.
    "q66_temperature_mix" ->
      """WITH c AS (
           SELECT source, count(*) AS n FROM documents GROUP BY source),
         w AS (
           SELECT source, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS weight
           FROM c),
         t AS (
           SELECT source, n, weight,
             least(n, (2000 * weight) //
               CAST((SELECT sum(weight) FROM w) AS BIGINT)) AS target_n
           FROM w),
         k AS (
           SELECT d.source, d.doc_id,
             row_number() OVER (PARTITION BY d.source ORDER BY
               CAST(concat('0x', substr(md5(concat('temp:',
                 CAST(d.doc_id AS VARCHAR))), 1, 8)) AS BIGINT),
               d.doc_id) AS rk
           FROM documents d),
         kept AS (
           SELECT k.source, k.doc_id
           FROM k JOIN t USING (source) WHERE rk <= target_n)
         SELECT source, count(*) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM kept GROUP BY source ORDER BY source""",
    // q50's gram CTE, but counting shared grams per doc instead of the
    // binary flag. Raw gram strings here vs hashed longs in the engine.
    "q67_contam_overlap" ->
      """WITH t AS (
           SELECT doc_id, source,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         g AS (
           SELECT doc_id, source,
             unnest(list_distinct(
               [l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
                for i in range(1, len(l) - 2)])) AS gram
           FROM t),
         bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0),
         ov AS (
           SELECT c.doc_id, c.source, count(*) AS n_grams,
             sum(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END)
               AS n_shared
           FROM (SELECT * FROM g WHERE doc_id % 17 <> 0) c
           LEFT JOIN bench ON c.gram = bench.gram
           GROUP BY c.doc_id, c.source
           HAVING sum(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END) > 0)
         SELECT source, count(*) AS n_contaminated,
           CAST(sum(n_grams) AS BIGINT) AS total_grams,
           CAST(sum(n_shared) AS BIGINT) AS total_shared,
           CAST(max((n_shared * 100) // n_grams) AS BIGINT) AS max_overlap_pct
         FROM ov GROUP BY source ORDER BY source""",
    // q57's chunk CTE extended with the chunk TEXT (inclusive-end list
    // slice), then the survivor window over its md5. DuckDB slices
    // truncate past the end exactly like Spark's slice(start, length).
    "q69_chunk_dedup" ->
      """WITH toks AS (
           SELECT doc_id, lang,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         sized AS (
           SELECT doc_id, lang, l, CAST(len(l) AS BIGINT) AS nt
           FROM toks WHERE len(l) > 0),
         chunks AS (
           SELECT doc_id, lang, l, nt, unnest(generate_series(
             CAST(0 AS BIGINT), (nt + 63) // 64 - 1)) AS chunk
           FROM sized),
         ct AS (
           SELECT doc_id, lang, chunk,
             md5(array_to_string(l[(chunk*64+1):(chunk*64+64)], ' ')) AS h,
             least(64, nt - chunk * 64) AS chunk_tokens
           FROM chunks),
         r AS (
           SELECT lang, chunk_tokens,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk) AS rk
           FROM ct)
         SELECT lang, count(*) AS n_chunks,
           CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique_chunks,
           CAST(sum(CASE WHEN rk = 1 THEN chunk_tokens ELSE 0 END) AS BIGINT)
             AS tokens_kept,
           CAST(sum(chunk_tokens) AS BIGINT) AS total_tokens
         FROM r GROUP BY lang ORDER BY lang""",
    "q70_sanitize" ->
      """WITH planted AS (
           SELECT source, text ||
             CASE WHEN doc_id % 3 = 0
               THEN chr(7) || 'alert' || chr(27) ELSE '' END ||
             CASE WHEN doc_id % 4 = 0
               THEN chr(8203) || 'zw' || chr(173) ELSE '' END AS text
           FROM documents),
         s AS (
           SELECT source, length(text) AS lc,
             length(regexp_replace(regexp_replace(text,
               '[\t\n\x0B\f\r\x{1C}-\x{1F}\x{0085}]', ' ', 'g'),
               '[\p{Cc}\p{Cf}]', '', 'g')) AS ls
           FROM planted)
         SELECT source,
           CAST(sum(CASE WHEN lc > ls THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_affected,
           CAST(sum(lc - ls) AS BIGINT) AS n_chars_removed,
           CAST(sum(ls) AS BIGINT) AS clean_chars
         FROM s GROUP BY source ORDER BY source""",
    "q71_blockwords" ->
      """WITH m AS (
           SELECT lang,
             len(list_filter(
               list_filter(regexp_split_to_array(lower(text), '\s+'),
                 x -> x <> ''),
               x -> x IN ('merge', 'batch', 'spark'))) AS nb
           FROM documents)
         SELECT lang,
           CAST(sum(CASE WHEN nb > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged_docs,
           CAST(sum(nb) AS BIGINT) AS total_blockwords
         FROM m GROUP BY lang ORDER BY lang""",
    // Per-doc entropy H = log2(n) - sum(c*log2 c)/n over 1-based char
    // indexing; rounded at 4 before min/max and at 3 after avg, exactly
    // like the Spark side.
    "q72_char_entropy" ->
      """WITH chars AS (
           SELECT doc_id, lang,
             unnest([text[i] for i in range(1, length(text) + 1)]) AS ch
           FROM documents WHERE length(text) > 0),
         cc AS (
           SELECT doc_id, lang, ch, count(*) AS c
           FROM chars GROUP BY doc_id, lang, ch),
         ent AS (
           SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS n_chars,
             round(log2(CAST(sum(c) AS DOUBLE)) -
               sum(c * log2(CAST(c AS DOUBLE))) / sum(c), 4) AS entropy_bits
           FROM cc GROUP BY doc_id, lang)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(entropy_bits), 3) AS avg_entropy_bits,
           min(entropy_bits) AS min_entropy_bits,
           max(entropy_bits) AS max_entropy_bits
         FROM ent GROUP BY lang ORDER BY lang""",
    // The expected metadata comes straight from the doc_id arithmetic the
    // synthetic headers were built from — agreement proves the byte-level
    // construct -> parse round trip is the identity.
    "q73_binary_meta" ->
      """SELECT source, count(*) AS n,
           CAST(sum(doc_id % 1800 + 100) AS BIGINT) AS width_sum,
           CAST(sum(doc_id % 997 + 50) AS BIGINT) AS height_sum,
           CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 44100 ELSE 16000 END)
             AS BIGINT) AS rate_sum,
           CAST(sum(doc_id % 2 + 1) AS BIGINT) AS channel_sum
         FROM documents GROUP BY source ORDER BY source""",
    // The JSONL round trip is the identity on valid rows, so the oracle
    // aggregates the original table directly; the dead-letter row is the
    // 7 planted lines. '___corrupt' sorts before 'src*' in both engines.
    "q79_jsonl" ->
      """SELECT source, count(*) AS n,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM documents GROUP BY source
         UNION ALL
         SELECT '___corrupt' AS source, CAST(7 AS BIGINT) AS n,
           CAST(0 AS BIGINT) AS id_sum
         ORDER BY source""",
    // brute-force cross cosine (LSH can only restrict candidates, never
    // add; at threshold 0.95 the relation is the planted identity pairs)
    "q93_emb_decontam" ->
      """WITH e AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
         r AS (
           SELECT vec_id + 100000 AS vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id % 13 = 0),
         p AS (
           SELECT e.vec_id AS id_a, r.vec_id AS id_b,
             list_cosine_similarity(e.v, r.v) AS sim
           FROM e CROSS JOIN r)
         SELECT count(*) AS n_pairs,
           CAST(sum(id_a) AS BIGINT) AS src_id_sum,
           CAST(sum(id_b - 100000 - id_a) AS BIGINT) AS offset_check,
           round(sum(round(sim, 4)), 1) AS sim_sum
         FROM p WHERE sim >= 0.95""",
    // the q58 winnowing CTE run twice: once over full corpus docs, once
    // over the sliced reference passages (l[5:14], 1-based inclusive ==
    // Spark slice(toks, 5, 10)); stop-fingerprint cap on the corpus side
    "q91_ref_passages" ->
      """WITH toks AS (
           SELECT lang, doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         grams AS (
           SELECT lang, doc_id,
             [array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)] AS gs
           FROM toks),
         hashes AS (
           SELECT lang, doc_id,
             [list_reduce([CAST(unicode(g[j]) AS BIGINT)
                           for j in range(1, length(g)+1)],
                          (a, b) -> (a * 257 + b) % 2147483647)
              for g in gs] AS hs
           FROM grams),
         winnowed AS (
           SELECT lang, doc_id,
             CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
                  WHEN len(hs) <= 4 THEN [list_min(hs)]
                  ELSE [list_min(hs[i:i+3]) for i in range(1, len(hs) - 2)]
             END AS mins
           FROM hashes),
         fp AS (
           SELECT lang, doc_id, unnest(list_distinct(mins)) AS fp
           FROM winnowed),
         rtoks AS (
           SELECT lang, doc_id, l[5:14] AS l
           FROM toks WHERE doc_id % 23 = 0 AND len(l) >= 14),
         rgrams AS (
           SELECT lang, doc_id,
             [array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)] AS gs
           FROM rtoks),
         rhashes AS (
           SELECT lang, doc_id,
             [list_reduce([CAST(unicode(g[j]) AS BIGINT)
                           for j in range(1, length(g)+1)],
                          (a, b) -> (a * 257 + b) % 2147483647)
              for g in gs] AS hs
           FROM rgrams),
         rwinnowed AS (
           SELECT lang, doc_id,
             CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
                  WHEN len(hs) <= 4 THEN [list_min(hs)]
                  ELSE [list_min(hs[i:i+3]) for i in range(1, len(hs) - 2)]
             END AS mins
           FROM rhashes),
         rfp AS (
           SELECT lang, doc_id, unnest(list_distinct(mins)) AS fp
           FROM rwinnowed),
         rare AS (
           SELECT lang, fp FROM fp GROUP BY lang, fp HAVING count(*) <= 100),
         keyed AS (
           SELECT f.lang, f.doc_id, f.fp
           FROM fp f JOIN rare r ON f.lang = r.lang AND f.fp = r.fp),
         pairs AS (
           SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) AS n_shared
           FROM keyed a JOIN rfp b
             ON a.lang = b.lang AND a.fp = b.fp
           GROUP BY a.lang, id_a, id_b HAVING count(*) >= 2)
         SELECT lang, count(*) AS n_pairs,
           count(DISTINCT id_a) AS n_corpus_flagged,
           count(DISTINCT id_b) AS n_refs_matched,
           CAST(sum(n_shared) AS BIGINT) AS shared_total
         FROM pairs GROUP BY lang ORDER BY lang""",
    // chr(239) = U+00EF (i-diaeresis); [[:punct:]] is RE2's spelling of
    // Java \p{Punct}; whitespace class explicit on both sides
    "q90_char_classes" ->
      """WITH planted AS (
           SELECT source, doc_id, text ||
             CASE WHEN doc_id % 3 = 0
               THEN ' na' || chr(239) || 've 3.14!' ELSE '' END AS text
           FROM documents),
         m AS (
           SELECT source,
             length(text) AS c,
             length(text) - length(regexp_replace(text,
               '[A-Za-z]', '', 'g')) AS l,
             length(text) - length(regexp_replace(text,
               '[0-9]', '', 'g')) AS d,
             length(text) - length(regexp_replace(text,
               '[[:punct:]]', '', 'g')) AS p,
             length(text) - length(regexp_replace(text,
               '[ \t\n\x0B\f\r]', '', 'g')) AS w,
             length(text) - length(regexp_replace(text,
               '[^\x00-\x7F]', '', 'g')) AS na
           FROM planted)
         SELECT source,
           CAST(sum(c) AS BIGINT) AS chars,
           CAST(sum(l) AS BIGINT) AS letters,
           CAST(sum(d) AS BIGINT) AS digits,
           CAST(sum(p) AS BIGINT) AS punct,
           CAST(sum(w) AS BIGINT) AS ws,
           CAST(sum(na) AS BIGINT) AS non_ascii,
           CAST(sum(CASE WHEN na > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_non_ascii
         FROM m GROUP BY source ORDER BY source""",
    // brute-force R-S Jaccard within each lang block — the operator's
    // prefix/length/positional filters must reproduce this exactly
    "q88_sim_decontam" ->
      """WITH c AS (
           SELECT doc_id, lang,
             list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS s
           FROM documents),
         b AS (
           SELECT doc_id, lang,
             list_distinct(list_filter(
               string_split_regex(text || ' canary', '\s+'),
               x -> x <> '')) AS s
           FROM documents WHERE doc_id % 17 = 0),
         p AS (
           SELECT c.lang, c.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(c.s, b.s)) * 1.0 /
               (len(c.s) + len(b.s) - len(list_intersect(c.s, b.s))) AS j
           FROM c JOIN b ON c.lang = b.lang
           WHERE len(c.s) > 0 AND len(b.s) > 0)
         SELECT lang, count(*) AS n_pairs,
           count(DISTINCT id_a) AS n_flagged,
           CAST(sum(CAST(round(j, 4) AS DECIMAL(10,4))) AS DOUBLE)
             AS sim_sum
         FROM p WHERE j >= 0.9
         GROUP BY lang ORDER BY lang""",
    // the same four regex passes + six literal replaces, &amp; last;
    // DuckDB regexp_replace takes RE2 inline flags in the pattern and
    // 'g' for global. The whitespace class is explicit ([ \t\n\x0B\f\r])
    // on BOTH sides — Java \s includes VT, RE2 \s does not
    "q87_strip_markup" ->
      """WITH planted AS (
           SELECT source, text ||
             CASE WHEN doc_id % 3 = 0
               THEN ' <p class="m">Tom &amp; Jerry</p>' ELSE '' END ||
             CASE WHEN doc_id % 4 = 0
               THEN ' <script>var x = 1 &lt; 2;</script><b>bold</b>'
               ELSE '' END ||
             CASE WHEN doc_id % 5 = 0
               THEN ' <!-- note --> five&nbsp;&#39;quoted&#39;'
               ELSE '' END AS text
           FROM documents),
         cleaned AS (
           SELECT source, text,
             trim(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text,
                         '(?is)<script\b[^>]*>.*?</script[ \t\n\x0B\f\r]*>',
                         ' ', 'g'),
                       '(?is)<style\b[^>]*>.*?</style[ \t\n\x0B\f\r]*>',
                       ' ', 'g'),
                     '(?s)<!--.*?-->', ' ', 'g'),
                   '<[^>]+>', ' ', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                 '&#39;', CAST(chr(39) AS VARCHAR)), '&nbsp;', ' '),
                 '&amp;', '&'),
               '[ \t\n\x0B\f\r]+', ' ', 'g')) AS clean
           FROM planted)
         SELECT source,
           CAST(sum(CASE WHEN clean <> text THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_changed,
           CAST(sum(length(text) - length(clean)) AS BIGINT)
             AS n_chars_removed,
           CAST(sum(length(clean)) AS BIGINT) AS clean_chars
         FROM cleaned GROUP BY source ORDER BY source""",
    // same quality-key CTE as q61; the budget cut is the maximal prefix
    // of the (qkey DESC, doc_id) order whose running token sum fits
    "q85_token_budget" ->
      """WITH m AS (
           SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS nt,
             len(list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> x <> ''))) AS ndt,
             length(text) AS nc,
             length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
           FROM documents),
         k AS (
           SELECT doc_id, lang, nt,
             (CASE WHEN nt = 0 THEN 0
                   ELSE least(nt, 20) * 20 + (ndt * 400) // nt END)
             + (CASE WHEN nc = 0 THEN 200 ELSE (np * 200) // nc END) AS qkey
           FROM m),
         c AS (
           SELECT doc_id, lang, qkey, nt,
             sum(nt) OVER (ORDER BY qkey DESC, doc_id) AS cum
           FROM k)
         SELECT lang, count(*) AS n_kept,
           CAST(sum(nt) AS BIGINT) AS tokens_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(min(qkey) AS BIGINT) AS min_kept_key
         FROM c WHERE cum <= 50000
         GROUP BY lang ORDER BY lang""",
    // bigrams via the 1-based list comprehension (i = 1..len-1 pairs
    // l[i] with l[i+1]); tokens are \s+-split so the first space of a
    // bigram string always separates its two words
    "q84_bigram_logprob" ->
      """WITH toks AS (
           SELECT doc_id, lang,
             list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '') AS l
           FROM documents),
         vocab AS (
           SELECT count(DISTINCT t) AS v
           FROM (SELECT unnest(l) AS t FROM toks)),
         bis AS (
           SELECT doc_id, lang,
             unnest([l[i] || ' ' || l[i+1] for i in range(1, len(l))]) AS bg
           FROM toks WHERE len(l) >= 2),
         bgc AS (SELECT bg, count(*) AS c_bg FROM bis GROUP BY bg),
         lfc AS (
           SELECT split_part(bg, ' ', 1) AS w1, count(*) AS c_left
           FROM bis GROUP BY w1),
         scored AS (
           SELECT doc_id, lang, count(*) AS n_bigrams,
             round(avg(log2((c_bg + 1) * 1.0 /
               (c_left + (SELECT v FROM vocab)))), 4) AS avg_log2_prob
           FROM bis
             JOIN bgc USING (bg)
             JOIN lfc ON split_part(bis.bg, ' ', 1) = lfc.w1
           GROUP BY doc_id, lang)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(n_bigrams) AS BIGINT) AS total_bigrams,
           round(avg(avg_log2_prob), 3) AS avg_score,
           min(avg_log2_prob) AS min_score,
           max(avg_log2_prob) AS max_score
         FROM scored GROUP BY lang ORDER BY lang""",
    // chr() code points: 769 = U+0301 combining acute, 778 = U+030A
    // combining ring, 776 = U+0308 combining diaeresis. Both engines
    // count length in code points, so the fold removes exactly one char
    // per combined pair.
    "q83_nfc_normalize" ->
      """WITH planted AS (
           SELECT source, text ||
             CASE WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769)
                  ELSE '' END ||
             CASE WHEN doc_id % 4 = 0
                  THEN ' A' || chr(778) || 'ngstro' || chr(776) || 'm'
                  ELSE '' END AS text
           FROM documents),
         s AS (
           SELECT source, length(text) AS lc,
             length(nfc_normalize(text)) AS ls
           FROM planted)
         SELECT source,
           CAST(sum(CASE WHEN lc > ls THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_changed,
           CAST(sum(lc - ls) AS BIGINT) AS n_marks_folded,
           CAST(sum(ls) AS BIGINT) AS clean_chars
         FROM s GROUP BY source ORDER BY source""",
    "q82_cms_heavy_sound" ->
      """SELECT CAST(NULL AS VARCHAR) AS token,
         CAST(NULL AS BIGINT) AS true_n, CAST(NULL AS BIGINT) AS est_n
         WHERE false""",
    // digest equality == text equality inside EACH engine, so the status
    // classification agrees even though it never compares digests across
    // engines (md5 is standard anyway)
    "q81_corpus_diff" ->
      """WITH old AS (
           SELECT doc_id, md5(text) AS od
           FROM documents WHERE doc_id % 7 <> 0),
         cur AS (
           SELECT doc_id,
             md5(CASE WHEN doc_id % 3 = 0 THEN text || ' [rev2]'
                      ELSE text END) AS cd
           FROM documents WHERE doc_id % 5 <> 0)
         SELECT CASE WHEN od IS NULL THEN 'added'
                     WHEN cd IS NULL THEN 'removed'
                     WHEN od <> cd THEN 'changed'
                     ELSE 'unchanged' END AS status,
           count(*) AS n
         FROM old FULL OUTER JOIN cur USING (doc_id)
         GROUP BY status ORDER BY status""",
    "q78_zorder" ->
      """WITH pts AS (
           SELECT source, CAST(doc_id % 1000 AS BIGINT) AS x,
             CAST((doc_id * 7) % 1000 AS BIGINT) AS y
           FROM documents),
         s1 AS (SELECT source,
             ((x | (x << 16)) & 281470681808895) AS x1,
             ((y | (y << 16)) & 281470681808895) AS y1 FROM pts),
         s2 AS (SELECT source,
             ((x1 | (x1 << 8)) & 71777214294589695) AS x2,
             ((y1 | (y1 << 8)) & 71777214294589695) AS y2 FROM s1),
         s3 AS (SELECT source,
             ((x2 | (x2 << 4)) & 1085102592571150095) AS x3,
             ((y2 | (y2 << 4)) & 1085102592571150095) AS y3 FROM s2),
         s4 AS (SELECT source,
             ((x3 | (x3 << 2)) & 3689348814741910323) AS x4,
             ((y3 | (y3 << 2)) & 3689348814741910323) AS y4 FROM s3),
         s5 AS (SELECT source,
             ((x4 | (x4 << 1)) & 6148914691236517205) AS x5,
             ((y4 | (y4 << 1)) & 6148914691236517205) AS y5 FROM s4),
         zv AS (SELECT source, (x5 | (y5 << 1)) AS z FROM s5)
         SELECT source, count(*) AS n,
           CAST(sum(z) AS BIGINT) AS z_sum,
           CAST(min(z) AS BIGINT) AS z_min,
           CAST(max(z) AS BIGINT) AS z_max
         FROM zv GROUP BY source ORDER BY source""",
    "q77_corpus_profile" ->
      """WITH m AS (
           SELECT source, text,
             len(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS nt
           FROM documents)
         SELECT source, count(*) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           count(DISTINCT md5(text)) AS n_unique_texts,
           CAST(min(nt) AS BIGINT) AS min_tokens,
           CAST(max(nt) AS BIGINT) AS max_tokens
         FROM m GROUP BY source ORDER BY source""",
    // The q61 quality-key CTE -> integer weight tier -> one uniform draw
    // per (doc, j<=wt) -> max per doc -> global top-100 by (key desc, id).
    "q76_weighted_sample" ->
      """WITH m AS (
           SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS nt,
             len(list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> x <> ''))) AS ndt,
             length(text) AS nc,
             length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
           FROM documents),
         w AS (
           SELECT doc_id, lang,
             ((CASE WHEN nt = 0 THEN 0
                    ELSE least(nt, 20) * 20 + (ndt * 400) // nt END)
              + (CASE WHEN nc = 0 THEN 200 ELSE (np * 200) // nc END)) // 250
               + 1 AS wt
           FROM m),
         d AS (
           SELECT doc_id, lang,
             unnest(generate_series(CAST(1 AS BIGINT), CAST(wt AS BIGINT)))
               AS j
           FROM w),
         draws AS (
           SELECT doc_id, lang,
             max(CAST(concat('0x', substr(md5(concat('wsample:',
               CAST(doc_id AS VARCHAR), ':', CAST(j AS VARCHAR))), 1, 8))
               AS BIGINT)) AS kdraw
           FROM d GROUP BY doc_id, lang),
         topk AS (
           SELECT doc_id, lang FROM draws
           ORDER BY kdraw DESC, doc_id LIMIT 100)
         SELECT lang, count(*) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM topk GROUP BY lang ORDER BY lang""",
    "q74_unigram_logprob" ->
      """WITH toks AS (
           SELECT doc_id, lang,
             unnest(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS term
           FROM documents),
         freqs AS (SELECT term, count(*) AS tf FROM toks GROUP BY term),
         tot AS (SELECT count(*) AS n FROM toks),
         scored AS (
           SELECT doc_id, lang, count(*) AS n_tokens,
             round(avg(log2(tf * 1.0 / (SELECT n FROM tot))), 4)
               AS avg_log2_prob
           FROM toks JOIN freqs USING (term)
           GROUP BY doc_id, lang)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(avg_log2_prob), 3) AS avg_score,
           min(avg_log2_prob) AS min_score,
           max(avg_log2_prob) AS max_score
         FROM scored GROUP BY lang ORDER BY lang""",
    "q75_url_domains" ->
      """WITH planted AS (
           SELECT doc_id, text ||
             CASE WHEN doc_id % 6 = 0
               THEN ' see https://site' || CAST(doc_id % 13 AS VARCHAR) ||
                 '.example.org/p/' || CAST(doc_id AS VARCHAR)
               ELSE '' END ||
             CASE WHEN doc_id % 9 = 0
               THEN ' ref http://cdn' || CAST(doc_id % 7 AS VARCHAR) || '.net'
               ELSE '' END AS text
           FROM documents),
         u AS (
           SELECT doc_id,
             unnest(regexp_extract_all(text,
               'https?://([A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+)(/[A-Za-z0-9._/%-]*)?',
               1)) AS domain
           FROM planted)
         SELECT domain, count(*) AS n_refs,
           count(DISTINCT doc_id) AS n_docs
         FROM u GROUP BY domain
         ORDER BY n_refs DESC, domain LIMIT 20""",
    "q68_token_hist" ->
      """WITH m AS (
           SELECT lang,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
               AS nt
           FROM documents)
         SELECT lang,
           CASE WHEN nt >= 400 THEN '000400_inf'
                WHEN nt >= 200 THEN '000200_000400'
                WHEN nt >= 100 THEN '000100_000200'
                WHEN nt >= 50 THEN '000050_000100'
                ELSE '000000_000050' END AS bucket,
           count(*) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens
         FROM m GROUP BY lang, bucket ORDER BY lang, bucket""",
    // Line frequencies counted on RAW line strings where the engine
    // counts md5 digests — agreement doubles as the collision check.
    // string_agg skips the NULLed (dropped) lines and orders by the
    // original position, exactly array_join(filter(...)); fully-emptied
    // docs coalesce to '' on both sides.
    "q94_line_dedup" ->
      """WITH planted AS (
           SELECT doc_id, source,
             concat_ws(chr(10),
               CASE WHEN doc_id % 5 = 0
                 THEN 'subscribe to our newsletter for daily updates' END,
               text,
               CASE WHEN doc_id % 9 = 0
                 THEN 'all rights reserved by the site owner' END) AS text
           FROM documents),
         lines AS (
           SELECT doc_id, source,
             unnest(string_split(text, chr(10))) AS line,
             generate_subscripts(string_split(text, chr(10)), 1) AS pos
           FROM planted),
         freq AS (
           SELECT line FROM lines GROUP BY line HAVING count(*) > 2),
         marked AS (
           SELECT l.doc_id, l.source, l.line, l.pos,
             (f.line IS NOT NULL) AS dropped
           FROM lines l LEFT JOIN freq f USING (line)),
         per_doc AS (
           SELECT doc_id, source,
             CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
             coalesce(string_agg(CASE WHEN NOT dropped THEN line END,
               chr(10) ORDER BY pos), '') AS clean
           FROM marked GROUP BY doc_id, source)
         SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_affected,
           CAST(sum(n_removed) AS BIGINT) AS n_lines_removed,
           CAST(sum(length(clean)) AS BIGINT) AS clean_chars,
           count(DISTINCT md5(clean)) AS n_distinct_clean
         FROM per_doc GROUP BY source ORDER BY source""",
    // Every canonicalization step replicated: fragment strip, scheme/host
    // lowercase, default-port strip, trailing-slash trim, utm_* filter +
    // parameter sort. regexp_extract returns '' on no match in both
    // engines; list_sort ASC == sort_array on ASCII.
    "q95_url_canonical" ->
      """WITH u AS (
           SELECT source,
             CASE WHEN doc_id % 4 = 0
                 THEN 'https://WWW.Example.COM:443/Products/' ||
                   CAST(doc_id % 10 AS VARCHAR) || '/?utm_source=mail&b=2&a=1#frag'
               WHEN doc_id % 4 = 1
                 THEN 'https://www.example.com/Products/' ||
                   CAST(doc_id % 10 AS VARCHAR) || '?a=1&b=2'
               WHEN doc_id % 4 = 2
                 THEN 'HTTP://Site.ORG:8080/a/b?z=' ||
                   CAST(doc_id % 5 AS VARCHAR) || '&utm_campaign=x'
               ELSE 'http://site.org:80/plain/' END AS url
           FROM documents),
         f AS (
           SELECT source, url, regexp_replace(url, '#.*$', '') AS nofrag
           FROM u),
         parts AS (
           SELECT source, url,
             lower(regexp_extract(nofrag,
               '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             lower(regexp_extract(regexp_extract(nofrag,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
               '^([^:]*)', 1)) AS host,
             regexp_extract(regexp_extract(nofrag,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
               ':([0-9]+)$', 1) AS port,
             regexp_replace(regexp_extract(nofrag,
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
               '/$', '') AS path,
             list_filter(string_split(
               regexp_extract(nofrag, '\?([^#]*)', 1), '&'),
               x -> x <> '' AND NOT starts_with(x, 'utm_')) AS params
           FROM f),
         canon AS (
           SELECT source, url,
             scheme || '://' || host ||
             CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                    OR (scheme = 'https' AND port = '443')
               THEN '' ELSE ':' || port END ||
             path ||
             CASE WHEN len(params) = 0 THEN ''
               ELSE '?' || array_to_string(list_sort(params), '&') END AS canon
           FROM parts)
         SELECT source, count(*) AS n_urls,
           count(DISTINCT url) AS n_distinct_raw,
           count(DISTINCT canon) AS n_distinct_canonical
         FROM canon GROUP BY source ORDER BY source""",
    // q53's recursive-CTE components + q42's md5 assignment, keyed on
    // coalesce(component, doc_id).
    "q96_leakage_split" ->
      """WITH RECURSIVE d AS (
           SELECT lang, doc_id,
             list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS sh
           FROM documents),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
             len(list_distinct(list_concat(a.sh, b.sh))) >= 0.95),
         edges AS (
           SELECT id_a AS s, id_b AS t FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT DISTINCT s AS id, s AS label FROM edges
           UNION
           SELECT e.s AS id, r.label FROM edges e JOIN reach r ON r.id = e.t),
         comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
         keyed AS (
           SELECT doc.doc_id,
             CAST(concat('0x', substr(md5(concat('leak:',
               CAST(coalesce(c.component, doc.doc_id) AS VARCHAR))), 1, 8))
               AS BIGINT) / 4294967296.0 AS u
           FROM documents doc LEFT JOIN comp c ON c.id = doc.doc_id)
         SELECT CASE WHEN u < 0.8 THEN 'train'
                     WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM keyed GROUP BY 1 ORDER BY split""",
    // Expected label recomputed from doc_id directly — construct -> sniff
    // must be the identity (1-byte junk payloads sniff as 'unknown').
    "q97_filetype_sniff" ->
      """SELECT source,
           CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
             WHEN 2 THEN 'jpeg' WHEN 3 THEN 'pdf' WHEN 4 THEN 'zip'
             ELSE 'unknown' END AS kind,
           count(*) AS n
         FROM documents GROUP BY source, kind ORDER BY source, kind""",
    // Gram frequencies counted on RAW k-gram strings where the engine
    // counts md5 digests (q98) / 2^64 rolling-polynomial hashes (q100) —
    // agreement doubles as the collision check for BOTH hash functions.
    // Positions are 1-based here, 0-based in the engine; every output is
    // a count or a reassembled string, so the base never surfaces. A new
    // span starts where the gap between consecutive sorted starts
    // exceeds k (== k is adjacent coverage and merges).
    "q98_span_dedup" -> SpanDedupOracleSql,
    "q100_span_dedup_fast" -> SpanDedupOracleSql,
    // The codec replicated bit-for-bit: CAST(FLOAT[] AS DOUBLE[]) widens
    // exactly, list_max of abs is exact selection, scale is ONE IEEE
    // division, q = floor(x/scale + 0.5) is exact, err recomputes q
    // inline (identical double ops). The error ratio surfaces as an
    // exact integer — floor(err/scale*10000 + 0.5) — because round-to-
    // DECIMAL diverged across engines on a half-way-boundary double
    // (driver round-6 hash mismatch); floor of IEEE ops is bit-portable.
    "q99_embed_quant" ->
      """WITH e AS (
           SELECT label,
             CASE WHEN vec_id % 250 = 0
               THEN list_transform(CAST(embedding AS DOUBLE[]), x -> 0.0)
               ELSE CAST(embedding AS DOUBLE[]) END AS v
           FROM embeddings),
         q AS (
           SELECT label, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
           FROM e),
         r AS (
           SELECT label, scale,
             CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
               ELSE list_transform(v,
                 x -> CAST(floor(x / scale + 0.5) AS INTEGER)) END AS qvec,
             CASE WHEN scale = 0 THEN 0.0
               ELSE list_max(list_transform(v,
                 x -> abs(x - floor(x / scale + 0.5) * scale))) END AS err
           FROM q)
         SELECT label, count(*) AS n_vecs,
           CAST(sum(list_sum(qvec)) AS BIGINT) AS sum_q,
           max(list_max(qvec)) AS max_q,
           min(list_min(qvec)) AS min_q,
           CAST(sum(CASE WHEN err > scale * 0.5000001 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_violations,
           max(CASE WHEN scale > 0
             THEN CAST(floor(err / scale * 10000 + 0.5) AS BIGINT) END)
             AS max_err_ratio_e4,
           CAST(sum(CASE WHEN scale = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_vecs
         FROM r GROUP BY label ORDER BY label""",
    // Both stages replicated: the q99 codec per side, integer dot
    // products via list comprehensions (exact int64 — CAST before the
    // product so 127*127 terms sum wide), the scale-free approximate
    // cosine as one double expression, candidate cut at k*4 by
    // (ascore DESC, id), exact rerank on the float vectors.
    "q101_quantized_rerank" ->
      """WITH cq AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec,
             list_max(list_transform(CAST(embedding AS DOUBLE[]),
               x -> abs(x))) / 127.0 AS scale
           FROM embeddings),
         c AS (
           SELECT id, vec,
             CASE WHEN scale = 0 THEN list_transform(vec, x -> 0)
               ELSE list_transform(vec,
                 x -> CAST(floor(x / scale + 0.5) AS INTEGER)) END AS qv
           FROM cq),
         cn AS (
           SELECT id, vec, qv,
             CAST(list_sum([CAST(qv[i] AS BIGINT) * qv[i]
               for i in range(1, len(qv) + 1)]) AS BIGINT) AS n2
           FROM c),
         qn AS (
           SELECT id AS qid, vec AS qvec, qv AS qqv, n2 AS qn2
           FROM cn WHERE id < 5),
         s AS (
           SELECT q.qid, v.id,
             CAST(list_sum([CAST(v.qv[i] AS BIGINT) * q.qqv[i]
               for i in range(1, len(v.qv) + 1)]) AS DOUBLE) /
               (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(q.qn2 AS DOUBLE)))
               AS ascore
           FROM qn q, cn v
           WHERE q.qid <> v.id AND v.n2 > 0 AND q.qn2 > 0),
         cand AS (
           SELECT qid, id,
             row_number() OVER (PARTITION BY qid ORDER BY ascore DESC, id)
               AS arank
           FROM s),
         exact AS (
           SELECT cand.qid, cand.id,
             list_cosine_similarity(v.vec, q.qvec) AS sim
           FROM cand
           JOIN cn v ON v.id = cand.id
           JOIN qn q ON q.qid = cand.qid
           WHERE cand.arank <= 40),
         r AS (
           SELECT qid, id, sim,
             CAST(row_number() OVER (
               PARTITION BY qid ORDER BY sim DESC, id) AS INTEGER) AS rnk
           FROM exact WHERE sim IS NOT NULL)
         SELECT qid, id, round(sim, 4) AS sim, rnk
         FROM r WHERE rnk <= 10 ORDER BY qid, rnk""",
    // The FULL brute-force levenshtein relation — the only prefilter is
    // the length band |len(a)-len(b)| <= 1, sound because one edit moves
    // length by at most one. Agreement proves the engine's
    // symmetric-delete blocking lost no pair.
    "q102_edit_dedup" ->
      """WITH t AS (
           SELECT doc_id,
             CASE doc_id % 8
               WHEN 0 THEN 'annual data report ' ||
                 CAST(doc_id // 8 AS VARCHAR) || ' final'
               WHEN 1 THEN 'annual data reprt ' ||
                 CAST(doc_id // 8 AS VARCHAR) || ' final'
               WHEN 2 THEN 'annual data rexort ' ||
                 CAST(doc_id // 8 AS VARCHAR) || ' final'
               WHEN 3 THEN 'annual data repoort ' ||
                 CAST(doc_id // 8 AS VARCHAR) || ' final'
               WHEN 4 THEN 'annual data rpeort ' ||
                 CAST(doc_id // 8 AS VARCHAR) || ' final'
               WHEN 5 THEN 'annual data report ' ||
                 CAST(doc_id // 8 AS VARCHAR) || ' final'
               WHEN 6 THEN 'quarterly summary ' ||
                 CAST(doc_id // 8 AS VARCHAR)
               ELSE 'quarterly sumary ' || CAST(doc_id // 8 AS VARCHAR)
             END AS title
           FROM documents),
         p AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             levenshtein(a.title, b.title) AS dist
           FROM t a JOIN t b
             ON a.doc_id < b.doc_id
            AND abs(length(a.title) - length(b.title)) <= 1)
         SELECT CAST(dist AS BIGINT) AS dist,
           count(*) AS n_pairs,
           CAST(sum(id_a) AS BIGINT) AS a_sum,
           CAST(sum(id_b) AS BIGINT) AS b_sum
         FROM p WHERE dist <= 1 GROUP BY dist ORDER BY dist""",
    // Extraction, the distinct edge relation, and both authority joins
    // replicated; hosts that appear only as sources report zeros via the
    // node-list left joins.
    "q103_host_authority" ->
      """WITH planted AS (
           SELECT
             'site' || CAST(doc_id % 13 AS VARCHAR) || '.example.org'
               AS src,
             text || ' see https://site' ||
               CAST((doc_id * 3 + 1) % 13 AS VARCHAR) ||
               '.example.org/x/' || CAST(doc_id AS VARCHAR) ||
               CASE WHEN doc_id % 4 = 0
                 THEN ' and https://cdn' || CAST(doc_id % 7 AS VARCHAR) ||
                   '.net'
                 ELSE '' END AS text
           FROM documents),
         e AS (
           SELECT DISTINCT src, dst FROM (
             SELECT lower(src) AS src,
               lower(unnest(regexp_extract_all(text,
                 '(?i)https?://([A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+)(/[A-Za-z0-9._/%-]*)?',
                 1))) AS dst
             FROM planted)
           WHERE dst <> '' AND src <> dst),
         nodes AS (
           SELECT src AS host FROM e UNION SELECT dst AS host FROM e),
         indeg AS (
           SELECT dst AS host, count(*) AS in_hosts FROM e GROUP BY dst),
         r2 AS (
           SELECT host, count(*) AS reach2 FROM (
             SELECT DISTINCT e2.dst AS host, e1.src AS origin
             FROM e e1 JOIN e e2 ON e1.dst = e2.src
             WHERE e1.src <> e2.dst)
           GROUP BY host)
         SELECT n.host,
           CAST(COALESCE(indeg.in_hosts, 0) AS BIGINT) AS in_hosts,
           CAST(COALESCE(r2.reach2, 0) AS BIGINT) AS reach2
         FROM nodes n
         LEFT JOIN indeg ON indeg.host = n.host
         LEFT JOIN r2 ON r2.host = n.host
         ORDER BY n.host""",
    // The SAME three integer-PageRank iterations unrolled: ranks in
    // micro-units, `//` everywhere Spark uses `div` — the whole
    // quantized diffusion is pinned, not a rounded summary.
    "q104_host_pagerank" ->
      """WITH planted AS (
           SELECT
             'site' || CAST(doc_id % 13 AS VARCHAR) || '.example.org'
               AS src,
             text || ' see https://site' ||
               CAST((doc_id * 3 + 1) % 13 AS VARCHAR) ||
               '.example.org/x/' || CAST(doc_id AS VARCHAR) ||
               CASE WHEN doc_id % 4 = 0
                 THEN ' and https://cdn' || CAST(doc_id % 7 AS VARCHAR) ||
                   '.net'
                 ELSE '' END AS text
           FROM documents),
         e AS (
           SELECT DISTINCT src, dst FROM (
             SELECT lower(src) AS src,
               lower(unnest(regexp_extract_all(text,
                 '(?i)https?://([A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+)(/[A-Za-z0-9._/%-]*)?',
                 1))) AS dst
             FROM planted)
           WHERE dst <> '' AND src <> dst),
         nodes AS (
           SELECT src AS host FROM e UNION SELECT dst AS host FROM e),
         outdeg AS (SELECT src AS host, count(*) AS od FROM e GROUP BY src),
         nn AS (SELECT count(*) AS n FROM nodes),
         r0 AS (SELECT host, CAST(1000000 AS BIGINT) AS rank FROM nodes),
         c1 AS (
           SELECT e.dst AS host, CAST(sum(r0.rank // od.od) AS BIGINT) AS s
           FROM e JOIN r0 ON r0.host = e.src
           JOIN outdeg od ON od.host = e.src GROUP BY e.dst),
         d1 AS (
           SELECT CAST(COALESCE(sum(r.rank), 0) // (SELECT n FROM nn)
             AS BIGINT) AS share
           FROM r0 r LEFT JOIN outdeg od ON od.host = r.host
           WHERE od.host IS NULL),
         r1 AS (
           SELECT n.host,
             CAST(150000 + (85 * (COALESCE(c1.s, 0)
               + (SELECT share FROM d1))) // 100 AS BIGINT) AS rank
           FROM nodes n LEFT JOIN c1 ON c1.host = n.host),
         c2 AS (
           SELECT e.dst AS host, CAST(sum(r1.rank // od.od) AS BIGINT) AS s
           FROM e JOIN r1 ON r1.host = e.src
           JOIN outdeg od ON od.host = e.src GROUP BY e.dst),
         d2 AS (
           SELECT CAST(COALESCE(sum(r.rank), 0) // (SELECT n FROM nn)
             AS BIGINT) AS share
           FROM r1 r LEFT JOIN outdeg od ON od.host = r.host
           WHERE od.host IS NULL),
         r2 AS (
           SELECT n.host,
             CAST(150000 + (85 * (COALESCE(c2.s, 0)
               + (SELECT share FROM d2))) // 100 AS BIGINT) AS rank
           FROM nodes n LEFT JOIN c2 ON c2.host = n.host),
         c3 AS (
           SELECT e.dst AS host, CAST(sum(r2.rank // od.od) AS BIGINT) AS s
           FROM e JOIN r2 ON r2.host = e.src
           JOIN outdeg od ON od.host = e.src GROUP BY e.dst),
         d3 AS (
           SELECT CAST(COALESCE(sum(r.rank), 0) // (SELECT n FROM nn)
             AS BIGINT) AS share
           FROM r2 r LEFT JOIN outdeg od ON od.host = r.host
           WHERE od.host IS NULL),
         r3 AS (
           SELECT n.host,
             CAST(150000 + (85 * (COALESCE(c3.s, 0)
               + (SELECT share FROM d3))) // 100 AS BIGINT) AS rank
           FROM nodes n LEFT JOIN c3 ON c3.host = n.host)
         SELECT host, rank AS pr FROM r3 ORDER BY pr DESC, host""",
    // Same tokenization as q68 (\s+ split, empties dropped) lowercased;
    // status from pre-coalesce side nullity, frequency classes by
    // multiplication (no division to round), hapax floor on the larger
    // side.
    "q105_vocab_drift" ->
      """WITH o AS (
           SELECT token, count(*) AS old_n FROM (
             SELECT unnest(list_filter(
               string_split_regex(lower(text ||
                 CASE WHEN doc_id % 6 = 0 THEN ' legacyterm' ELSE '' END ||
                 CASE WHEN doc_id % 20 = 4 THEN ' cycletag' ELSE '' END ||
                 CASE WHEN doc_id % 20 = 14
                   THEN ' fadetag fadetag fadetag' ELSE '' END),
               '\s+'), x -> x <> '')) AS token
             FROM documents WHERE doc_id % 10 < 8)
           GROUP BY token),
         c AS (
           SELECT token, count(*) AS new_n FROM (
             SELECT unnest(list_filter(
               string_split_regex(lower(text ||
                 CASE WHEN doc_id % 5 = 0 THEN ' neoterm neoterm' ELSE '' END ||
                 CASE WHEN doc_id % 20 = 4
                   THEN ' cycletag cycletag cycletag' ELSE '' END ||
                 CASE WHEN doc_id % 20 = 14 THEN ' fadetag' ELSE '' END),
               '\s+'), x -> x <> '')) AS token
             FROM documents WHERE doc_id % 10 >= 2)
           GROUP BY token),
         j AS (
           SELECT
             CASE WHEN o.token IS NULL THEN 'added'
                  WHEN c.token IS NULL THEN 'removed'
                  WHEN c.new_n >= 2 * o.old_n THEN 'grown'
                  WHEN 2 * c.new_n <= o.old_n THEN 'shrunk'
                  ELSE 'stable' END AS status,
             COALESCE(o.old_n, 0) AS old_n,
             COALESCE(c.new_n, 0) AS new_n
           FROM o FULL OUTER JOIN c ON o.token = c.token)
         SELECT status, count(*) AS n_tokens,
           CAST(sum(old_n) AS BIGINT) AS old_total,
           CAST(sum(new_n) AS BIGINT) AS new_total
         FROM j WHERE greatest(old_n, new_n) >= 2
         GROUP BY status ORDER BY status""",
    // CASE ladder + LEAST clip, `//` for the utilization — every column
    // an exact integer.
    "q106_length_buckets" ->
      """WITH m AS (
           SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS BIGINT) AS nt
           FROM documents),
         b AS (
           SELECT nt,
             CASE WHEN nt <= 16 THEN 16 WHEN nt <= 32 THEN 32
                  WHEN nt <= 64 THEN 64 ELSE 96 END AS bucket,
             LEAST(nt, CASE WHEN nt <= 16 THEN 16 WHEN nt <= 32 THEN 32
                  WHEN nt <= 64 THEN 64 ELSE 96 END) AS kept
           FROM m)
         SELECT CAST(bucket AS BIGINT) AS bucket,
           count(*) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS token_total,
           CAST(sum(bucket - kept) AS BIGINT) AS padded_tokens,
           CAST(sum(nt - kept) AS BIGINT) AS truncated_tokens,
           CAST(sum(kept) AS BIGINT) * 100 //
             (count(*) * CAST(bucket AS BIGINT)) AS utilization_pct
         FROM b GROUP BY bucket ORDER BY bucket""",
    // q96's recursive components + q85's integer quality key; survivors
    // are rank 1 per coalesce(component, doc_id) by (qkey DESC, doc_id)
    // — singletons are their own component and always survive.
    "q107_best_survivor" ->
      """WITH RECURSIVE d AS (
           SELECT lang, doc_id,
             list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS sh
           FROM documents),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
             len(list_distinct(list_concat(a.sh, b.sh))) >= 0.95),
         edges AS (
           SELECT id_a AS s, id_b AS t FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT DISTINCT s AS id, s AS label FROM edges
           UNION
           SELECT e.s AS id, r.label FROM edges e JOIN reach r ON r.id = e.t),
         comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
         m AS (
           SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS nt,
             len(list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> x <> ''))) AS ndt,
             length(text) AS nc,
             length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
           FROM documents),
         k AS (
           SELECT doc_id, lang,
             (CASE WHEN nt = 0 THEN 0
                   ELSE least(nt, 20) * 20 + (ndt * 400) // nt END)
             + (CASE WHEN nc = 0 THEN 200 ELSE (np * 200) // nc END) AS qkey
           FROM m),
         rk AS (
           SELECT k.lang, k.doc_id, k.qkey,
             row_number() OVER (
               PARTITION BY coalesce(c.component, k.doc_id)
               ORDER BY k.qkey DESC, k.doc_id) AS rk
           FROM k LEFT JOIN comp c ON c.id = k.doc_id)
         SELECT lang, count(*) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(qkey) AS BIGINT) AS qkey_sum
         FROM rk WHERE rk = 1 GROUP BY lang ORDER BY lang""",
    // The per-group form of q85's prefix rule: one window partitioned by
    // lang, budgets joined from the recipe VALUES — zero-budget and
    // absent groups fall out identically on both engines.
    "q108_token_mix" ->
      """WITH m AS (
           SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS nt,
             len(list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> x <> ''))) AS ndt,
             length(text) AS nc,
             length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
           FROM documents),
         k AS (
           SELECT doc_id, lang, nt,
             (CASE WHEN nt = 0 THEN 0
                   ELSE least(nt, 20) * 20 + (ndt * 400) // nt END)
             + (CASE WHEN nc = 0 THEN 200 ELSE (np * 200) // nc END) AS qkey
           FROM m),
         b (lang, budget) AS (
           VALUES ('en', 6000), ('de', 2000), ('zh', 5000), ('fr', 0)),
         c AS (
           SELECT k.doc_id, k.lang, k.qkey, k.nt, b.budget,
             sum(k.nt) OVER (
               PARTITION BY k.lang ORDER BY k.qkey DESC, k.doc_id) AS cum
           FROM k JOIN b ON b.lang = k.lang)
         SELECT lang, count(*) AS n_kept,
           CAST(sum(nt) AS BIGINT) AS tokens_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(min(qkey) AS BIGINT) AS min_kept_key
         FROM c WHERE cum <= budget
         GROUP BY lang ORDER BY lang""",
    // q51's window assignment + ordered string_agg: the md5 digest pins
    // every pack's exact byte layout (separator placement included).
    "q109_pack_texts" ->
      """WITH d AS (
           SELECT doc_id, text, doc_id % 8 AS shard,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
               AS n_toks
           FROM documents),
         p AS (
           SELECT shard, doc_id, text, n_toks,
             CAST((sum(n_toks) OVER w - n_toks) // 512 AS BIGINT) AS pack
           FROM d
           WINDOW w AS (PARTITION BY shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING))
         SELECT shard, pack, count(*) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS pack_tokens,
           md5(string_agg(text, ' ' ORDER BY doc_id)) AS digest
         FROM p GROUP BY shard, pack ORDER BY shard, pack""",
    // Classification on RAW TEXT (no hash anywhere): the engine's
    // xxhash64-Bloom + md5-verify composition must land on exactly this
    // relation — agreement doubles as the collision check.
    "q110_incremental_dedup" ->
      """WITH batch AS (
           SELECT a.doc_id,
             CASE WHEN a.doc_id % 2 = 0 THEN b.text ELSE a.text END AS text
           FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
           WHERE a.doc_id % 3 = 0),
         ct AS (
           SELECT DISTINCT text FROM documents WHERE doc_id % 3 <> 0),
         c AS (
           SELECT batch.doc_id, ct.text IS NULL AS is_new
           FROM batch LEFT JOIN ct ON ct.text = batch.text)
         SELECT is_new, count(*) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM c GROUP BY is_new ORDER BY is_new""",
    "q112_ivf_append" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    "q149_ivf_compact" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    // The same three RE2-common patterns; both engines trim only 0x20,
    // so blank segments classify identically.
    "q113_readability" ->
      """WITH planted AS (
           SELECT lang, text ||
             CASE WHEN doc_id % 3 = 0
               THEN '. Plus a short tail! Readable? Yes' ELSE '' END AS text
           FROM documents),
         m AS (
           SELECT lang,
             len(list_filter(string_split_regex(text, '[.!?]+'),
               x -> trim(x) <> '')) AS ns,
             len(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS nw,
             len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS nv
           FROM planted)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(ns) AS BIGINT) AS sentences,
           CAST(sum(nw) AS BIGINT) AS words,
           CAST(sum(nv) AS BIGINT) AS vowel_groups
         FROM m GROUP BY lang ORDER BY lang""",
    // range(k) = [0..k-1] (empty at 0) replicates the explode exactly;
    // epoch_sum pins the tag values, not just the volumes.
    "q114_epoch_mix" ->
      """WITH e (lang, epochs) AS (
           VALUES ('en', 2), ('de', 3), ('zh', 1), ('fr', 0)),
         r AS (
           SELECT d.lang, d.doc_id,
             unnest(range(e.epochs)) AS epoch
           FROM documents d JOIN e ON e.lang = d.lang)
         SELECT lang, count(*) AS n_rows,
           count(DISTINCT doc_id) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(epoch) AS BIGINT) AS epoch_sum
         FROM r GROUP BY lang ORDER BY lang""",
    // 1-indexed substring walk, identical tie-break (n DESC, pair ASC).
    "q115_char_pairs" ->
      """WITH p AS (
           SELECT unnest([substr(text, i, 2)
             for i in range(1, length(text))]) AS pair
           FROM documents WHERE length(text) >= 2)
         SELECT pair, count(*) AS n
         FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 30""",
    // Same total order (n_chars DESC, doc_id) and the same absolute cut.
    "q121_domain_cap" ->
      """WITH r AS (
           SELECT lang, source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY n_chars DESC, doc_id) AS rn
           FROM documents)
         SELECT lang, source, count(*) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(min(n_chars) AS BIGINT) AS min_kept_chars
         FROM r WHERE rn <= 25
         GROUP BY lang, source ORDER BY lang, source""",
    // q27's brute force plus the two mining predicates: different label,
    // similarity in [0.2, 0.9). Same tie order (sim DESC, id).
    "q122_hard_negatives" ->
      """WITH q AS (
           SELECT vec_id AS qid, label AS qlabel,
             CAST(embedding AS DOUBLE[]) AS qvec
           FROM embeddings WHERE vec_id < 5),
         c AS (
           SELECT vec_id AS id, label, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
         s AS (
           SELECT qid, id, label, list_cosine_similarity(qvec, vec) AS sim
           FROM q, c WHERE qid <> id AND label <> qlabel),
         b AS (
           SELECT * FROM s WHERE sim >= 0.2 AND sim < 0.9),
         r AS (
           SELECT qid, id, label, sim,
             CAST(row_number() OVER (
               PARTITION BY qid ORDER BY sim DESC, id) AS INTEGER) AS rnk
           FROM b)
         SELECT qid, id, label, round(sim, 4) AS sim, rnk
         FROM r WHERE rnk <= 10 ORDER BY qid, rnk""",
    "q124_mmr_rerank" -> MmrOracleSql,
    // Every sliding chunk rebuilt with the same integral start grid and
    // the same 1-based clamped list slice; texts pinned via summed
    // lengths + distinct md5.
    "q125_sliding_chunks" ->
      """WITH toks AS (
           SELECT doc_id, lang,
             list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '') AS l
           FROM documents),
         docs AS (
           SELECT doc_id, lang, l, CAST(len(l) AS BIGINT) AS n
           FROM toks WHERE len(l) > 0),
         chunks AS (
           SELECT doc_id, lang, l, n, unnest(generate_series(
             CAST(0 AS BIGINT),
             CASE WHEN n <= 48 THEN 0 ELSE (n - 48 + 31) // 32 END))
             AS chunk
           FROM docs),
         sized AS (
           SELECT doc_id, lang, chunk, chunk * 32 AS cs,
             least(48, n - chunk * 32) AS chunk_tokens,
             array_to_string(
               l[CAST(chunk * 32 + 1 AS BIGINT):
                 CAST(chunk * 32 + 48 AS BIGINT)], ' ') AS chunk_text
           FROM chunks)
         SELECT lang,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_chunks,
           CAST(sum(chunk_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN chunk_tokens = 48 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_full,
           CAST(max(cs) AS BIGINT) AS max_start,
           CAST(sum(length(chunk_text)) AS BIGINT) AS chunk_chars,
           count(DISTINCT md5(chunk_text)) AS n_distinct_chunks
         FROM sized GROUP BY lang ORDER BY lang""",
    // The exact relation: the engine's gate emits it only if the
    // sketch-merge invariants held (merged == single-pass, within-bound).
    "q126_hll_incremental" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY event_type ORDER BY event_type""",
    // Full BM25 replication. Float replicability: avgdl is ONE IEEE
    // division of exact integers; each term part mirrors the engine's
    // expression tree node for node — ln(1 + (N - df + 0.5)/(df + 0.5))
    // times the PARENTHESIZED saturation quotient (an unparenthesized
    // `ln * tf * 2.2 / d` would associate the multiplies differently);
    // (1.2 + 1.0) folds to the same double both sides. The per-(q, d)
    // sum is ≤ |query| = 4 terms, the q74 summation precedent.
    "q127_bm25" -> Bm25OracleSql,
    // The race gate's final stable probe: the survivors-only relation
    // (every multiple of 10 tombstoned then vacuumed) under the
    // verbatim BM25 arithmetic — equality here plus the gate's own
    // probe-vs-probe requires pins "pre == mid-churn == post".
    "q186_stable_probe_race" -> bm25OracleOver("doc_id % 10 <> 0"),
    // Registry reader-race (q186's shape for the registry family): the
    // final stable membership probe must equal first-arrival-with-
    // takedown-timing semantics. The tombstone lands between batches, so
    // the live digest set is: batch-0 winners surviving the takedown,
    // plus batch-1 first arrivals whose digest was NOT witnessed at
    // batch-1 time (a digest whose tombstoned batch-0 winner stopped
    // witnessing is re-accepted — the registry's takedown contract).
    "q187_registry_probe_race" ->
      """WITH b0 AS (
           SELECT doc_id, md5(text) AS digest FROM documents
           WHERE doc_id % 2 = 0),
         b0w AS (
           SELECT doc_id, digest FROM (
             SELECT doc_id, digest,
               row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
             FROM b0) WHERE rn = 1),
         b0live AS (SELECT digest FROM b0w WHERE doc_id % 10 <> 0),
         b1 AS (
           SELECT doc_id, md5(text) AS digest FROM documents
           WHERE doc_id % 2 = 1),
         b1w AS (
           SELECT doc_id, digest FROM (
             SELECT doc_id, digest,
               row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
             FROM b1) WHERE rn = 1),
         b1stored AS (
           SELECT digest FROM b1w
           WHERE digest NOT IN (SELECT digest FROM b0live)),
         live AS (
           SELECT digest FROM b0live
           UNION SELECT digest FROM b1stored)
         SELECT d.doc_id AS doc_id,
           CAST(md5(d.text) NOT IN (SELECT digest FROM live) AS INT)
             AS is_new
         FROM documents d
         WHERE d.doc_id % 3 = 0
         ORDER BY doc_id""",
    // The appended index must reproduce the full-corpus relation
    // exactly — same oracle, by reference (the q134 rationale:
    // persistence, pruning, and now INCREMENTAL MAINTENANCE are
    // storage concerns, not semantics).
    "q143_bm25_append" -> Bm25OracleSql,
    // The indexed probe must reproduce q127's relation exactly — same
    // oracle, by reference: persistence and partition pruning are
    // storage concerns, not semantics.
    "q134_bm25_index_parity" -> Bm25OracleSql,
    // Compaction is a pure file-layout rewrite: the probe over the
    // compacted index must STILL reproduce q127's relation — same
    // oracle, by reference (the q134/q143 rationale extended to
    // maintenance).
    "q145_bm25_compact" -> Bm25OracleSql,
    // Index deletion: the post-delete probe must equal the SAME scoring
    // over the ANTI-JOINED corpus — the one parameterized departure
    // from the q127 CTEs (every statistic, N and avgdl included, now
    // derives from the surviving docs, exactly what a from-scratch
    // rebuild would compute).
    "q155_bm25_delete" -> bm25OracleOver("doc_id % 5 <> 0"),
    // Takedown queue: after the forced flush the probe must equal the
    // survivors-only scoring; the gate additionally requires the SOFT
    // (pre-flush, overlay-suppressed) relation to equal the same rows —
    // tombstone exactness under the queue's policy layer.
    "q189_takedown_queue" -> bm25OracleOver("doc_id % 7 <> 0"),
    // IVF deletion soundness (the q149 empty-relation shape): corpus ==
    // surviving assignment, no doomed id in any probe.
    "q156_ivf_delete" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    // Shard-and-merge: the merged index must reproduce the full-corpus
    // relation exactly — same oracle, by reference (the q134/q143/q145
    // rationale: shard layout and merge are storage concerns, not
    // semantics).
    "q158_bm25_merge" -> Bm25OracleSql,
    // Streaming ingest: after the phased replay (with its manufactured
    // crash windows) the index must hold EXACTLY the full corpus once —
    // same oracle, by reference (the q143 rationale carried to the
    // stream: delivery is a storage/transport concern, not semantics).
    "q162_bm25_stream_ingest" -> Bm25OracleSql,
    // The dense twin: the streamed-in IVF index must reproduce q35's
    // direct-form relation exactly (the q161 rationale for transport).
    "q163_ivf_stream_ingest" -> IvfOracleSql,
    // Quantized-index streaming ingest soundness (the q159
    // empty-relation shape over a streamed-in index).
    "q166_ivfq_stream_ingest" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    // Cell-split rebalance soundness (the q159 empty-relation shape
    // over a rebalanced index, plus exact row-preservation and
    // did-actually-split checks): sound output = empty.
    "q168_ivfq_cell_split" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    // Quantizer-refresh soundness (the q159 empty-relation shape over a
    // deliberately drifted-then-requantized index, plus strict-
    // assignment fsck) UNION a non-vacuity payload: the violation rows
    // stay expected-empty, and three pinned scalars make the hash
    // load-bearing on its own — cells and centroids_match are exactly
    // nlist=16 only when the refresh retrained on the FULL corpus
    // (centroids_match counts stored-vs-in-session-retrain equality;
    // the build's quarter-corpus quantizer matches 0), corpus_rows
    // pins row preservation through the rewrite.
    "q185_ivfq_requantize" ->
      """SELECT 'post_requantize_cells' AS kind, CAST(16 AS BIGINT) AS n
         UNION ALL
         SELECT 'post_requantize_corpus_rows',
           (SELECT count(*) FROM embeddings)
         UNION ALL
         SELECT 'post_requantize_centroids_match', 16""",
    // Streaming first-arrival dedup into the corpus registry: rebuild
    // the gate's exact phased stream (originals by doc_id mod 3, the
    // planted within-batch and cross-batch duplicate re-keys), rank
    // every row by arrival order (phase, then id — the registry's
    // documented tiebreak), keep rank 1 per content digest. The
    // registry's own stats rows ride along so a double-applied or
    // skipped-on-marker-failure batch is caught even when the corpus
    // row set converges.
    "q167_dedup_stream_ingest" ->
      s"""WITH stream AS ($DedupStreamSql),
         ranked AS (
           SELECT doc_id,
             row_number() OVER (PARTITION BY md5(text) ORDER BY ph, doc_id)
               AS rn
           FROM stream),
         acc AS (SELECT doc_id FROM ranked WHERE rn = 1)
         SELECT doc_id, 'doc' AS kind FROM acc
         UNION ALL
         SELECT (SELECT count(*) FROM acc), 'n_docs'
         UNION ALL
         SELECT (SELECT count(*) FROM ranked) - (SELECT count(*) FROM acc),
           'n_dropped'
         ORDER BY kind, doc_id""",
    // Curate-then-index: the BM25 relation over the first-arrival
    // survivors of the SAME stream — what the composed sink's standing
    // index must score after dedup dropped every planted duplicate.
    "q169_dedup_index_stream" -> bm25OracleOverCorpus(DedupAcceptedSql),
    // Streaming near-dup registry soundness (the q38/q40 shape: the
    // banding is engine-defined, so the gate emits a VIOLATION relation
    // — planted-copy survival, unwitnessed drops, alien/dup ids, stats
    // drift — and the oracle is the empty relation).
    "q170_neardup_stream_ingest" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    // Distributed exact-registry bootstrap (shard-and-merge): digest
    // equality is transitive, so the merged registry must equal the
    // single-batch build over the union — globally smallest id per
    // digest, stats conserving the raw stream (the q167 output shape,
    // global min-id ranking instead of first-arrival-by-phase).
    "q171_dedup_registry_merge" ->
      s"""WITH stream AS ($DedupStreamSql),
           winners AS (
             SELECT doc_id FROM (
               SELECT doc_id,
                 row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
                   AS rn
               FROM stream) WHERE rn = 1),
           st AS (SELECT count(*) AS n FROM stream),
           w AS (SELECT count(*) AS n FROM winners)
         SELECT doc_id, 'doc' AS kind FROM winners
         UNION ALL SELECT n, 'n_docs' FROM w
         UNION ALL SELECT st.n - w.n, 'n_dropped' FROM st, w
         ORDER BY kind, doc_id""",
    // Near-dup registry shard-and-merge soundness (the q170 shape:
    // banding is engine-defined, the gate emits a violation relation,
    // the oracle is the empty relation).
    "q172_neardup_registry_merge" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    // Federated BM25 over 4 shard indexes == the full-corpus ranking
    // (q127's verbatim oracle — global stats are the only coupling).
    "q173_bm25_federated" -> Bm25OracleSql,
    // Federated IVF over 4 shared-quantizer shards == the full-IVF
    // ranking (q35's verbatim full-IVF-in-SQL oracle).
    "q174_ivf_federated" -> IvfOracleSql,
    // Artifact fsck over healthy multi-generation states: the audits
    // emit a violation relation and the oracle is the empty relation
    // (FsckSpec proves each check fires on planted corruption).
    "q175_index_fsck" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    // Fuzzy curate-then-index composition soundness (the q170 shape:
    // the registry-soundness body verbatim + the index pinned
    // row-for-row to a re-derivation from the registry's corpus +
    // bm25Fsck + non-vacuity; empty oracle).
    "q176_neardup_index_stream" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    // Soft-delete lifecycle on the BM25 index: the tombstoned probe
    // (phase 'soft', NO rewrite) and the post-physical-delete probe
    // (phase 'hard') must BOTH equal the q155 relation — the verbatim
    // BM25 arithmetic over the anti-joined corpus, emitted twice.
    "q177_bm25_tombstone" ->
      s"""WITH r AS (${bm25OracleOver("doc_id % 5 <> 0")})
         SELECT query_id, rnk, doc_id, score, 'hard' AS phase FROM r
         UNION ALL
         SELECT query_id, rnk, doc_id, score, 'soft' FROM r
         ORDER BY phase, query_id, rnk""",
    // Soft-delete on the IVF index (exclusion property — violation
    // relation, empty oracle).
    "q178_ivf_tombstone" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    // Near-dup registry read-side probe soundness (the q170 family:
    // violation relation, empty oracle).
    "q179_neardup_probe" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    // Vacuum on the BM25 index: after the partial physical apply and
    // the vacuum of the remainder, the probe must equal the q155
    // relation (verbatim BM25 arithmetic over the anti-joined corpus);
    // the engine encodes the overlay invariants in the phase label, so
    // a wrong overlay state surfaces as a phase mismatch.
    "q180_bm25_vacuum" ->
      s"""WITH r AS (${bm25OracleOver("doc_id % 5 <> 0")})
         SELECT query_id, rnk, doc_id, score, 'vacuumed' AS phase FROM r
         ORDER BY query_id, rnk""",
    // Vacuum on the IVF index (exclusion property — violation relation,
    // empty oracle).
    "q181_ivf_vacuum" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    // Dense serving-stack drill (exclusion property per probe phase —
    // violation relation, empty oracle).
    "q183_ivf_serving_stack" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    // The live serving-stack drill: five federated main+delta probes,
    // each the verbatim BM25 arithmetic over the corpus AS OF that
    // instant of the replay — streamed-in phases added, tombstoned
    // takedowns removed (including the two probes fired in the window
    // AFTER a takedown landed but BEFORE anything physically applied
    // it), the final probe after both vacuums. Survivor predicates are
    // pure doc_id arithmetic, so each phase is an exact corpus CTE.
    "q182_bm25_serving_stack" -> {
      val t1 = "(doc_id % 3 <> 0 AND doc_id % 5 = 0) OR " +
        "(doc_id % 9 = 0 AND doc_id % 4 = 0)"
      val t2 = "(doc_id % 9 = 3 AND doc_id % 5 = 0)"
      // the pre-registered takedown: recorded at the t1 step, naming
      // phase-2 docs — a no-op while they are absent (excluding an
      // absent doc changes nothing), binding the instant they arrive
      val t3 = "(doc_id % 9 = 6 AND doc_id % 7 = 0)"
      def corpus(phasePred: String, minus: Seq[String]): String =
        s"SELECT doc_id, text FROM documents WHERE ($phasePred)" +
          minus.map(m => s" AND NOT ($m)").mkString
      val phases = Seq(
        ("p0", corpus("doc_id % 3 <> 0 OR doc_id % 9 = 0", Seq.empty)),
        ("t1_window",
          corpus("doc_id % 3 <> 0 OR doc_id % 9 = 0", Seq(t1))),
        ("t2_window",
          corpus("doc_id % 3 <> 0 OR doc_id % 9 IN (0, 3)", Seq(t1, t2))),
        ("p2",
          corpus("doc_id % 3 <> 0 OR doc_id % 9 IN (0, 3, 6)",
            Seq(t1, t2, t3))),
        ("z_hard",
          corpus("doc_id % 3 <> 0 OR doc_id % 9 IN (0, 3, 6)",
            Seq(t1, t2, t3))))
      phases.map { case (label, corpusSql) =>
        s"""SELECT query_id, rnk, doc_id, score, '$label' AS phase
           FROM (${bm25OracleOverCorpus(corpusSql)})"""
      }.mkString("", "\nUNION ALL\n", "\nORDER BY phase, query_id, rnk")
    },
    // Quantized-IVF soundness (the q41/q156 empty-relation shape):
    // every hit exact-cosine-verified, cell-pruning respected,
    // non-vacuous.
    "q159_ivfq_index" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    // q207: the PQ index under the same two-stage soundness relation —
    // expected empty (ADC selects, exact cosines re-verified in-gate).
    "q207_ivfpq_index" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    // q208: the streamed PQ estate under the same relation — expected
    // empty (exactly-once drill + fsck teeth are in-gate requires).
    "q208_ivfpq_stream_ingest" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    // IVF shard-and-merge: the merged index must reproduce q35's
    // direct-form relation exactly — same oracle, by reference (the
    // q59 rationale extended to the distributed build: sharding and
    // merging are storage concerns, not semantics).
    "q161_ivf_shard_merge" -> IvfOracleSql,
    // The whole NB model in SQL: the q45 quality CTE labels the seed,
    // class counts + add-one log-odds weights + ln prior replicate the
    // engine's training, and scoring is the same inner-join occurrence
    // sum (unseen terms drop on both sides). Per-doc scores round to 4
    // before the per-(lang, pred) profile — the q74 anchoring shape.
    "q128_nb_quality" ->
      """WITH m AS (
           SELECT doc_id, text,
             len(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS nt,
             len(list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> ''))) AS ndt,
             length(text) AS nc,
             length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
           FROM documents WHERE doc_id < 200),
         seed AS (
           SELECT doc_id, text,
             (least(1.0, nt / 20.0) * 0.4 +
              (CASE WHEN nt = 0 THEN 0.0 ELSE ndt * 1.0 / nt END) * 0.4 +
              (CASE WHEN nc = 0 THEN 1.0 ELSE np * 1.0 / nc END) * 0.2)
               >= 0.75 AS pos
           FROM m),
         nd AS (
           SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
             sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nn
           FROM seed),
         stoks AS (
           SELECT pos, unnest(list_filter(
             regexp_split_to_array(text, '\s+'), x -> x <> '')) AS term
           FROM seed),
         cnts AS (
           SELECT term,
             CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cpos,
             CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cneg
           FROM stoks GROUP BY term),
         tots AS (
           SELECT CAST(sum(cpos) AS BIGINT) AS tp,
             CAST(sum(cneg) AS BIGINT) AS tn,
             count(*) AS v
           FROM cnts),
         w AS (
           SELECT term,
             ln((cpos + 1) * 1.0 / (tots.tp + tots.v)) -
             ln((cneg + 1) * 1.0 / (tots.tn + tots.v)) AS w
           FROM cnts CROSS JOIN tots),
         ttoks AS (
           SELECT d.doc_id, d.lang, unnest(list_filter(
             regexp_split_to_array(d.text, '\s+'), x -> x <> '')) AS term
           FROM documents d WHERE d.doc_id >= 200),
         perdoc AS (
           SELECT t.doc_id, t.lang, count(*) AS n_terms,
             ln((SELECT np FROM nd) * 1.0 / (SELECT nn FROM nd)) + sum(w.w)
               AS score
           FROM ttoks t JOIN w USING (term)
           GROUP BY t.doc_id, t.lang),
         anchored AS (
           SELECT lang, n_terms, round(score, 4) AS score_r,
             score > 0 AS pred
           FROM perdoc)
         SELECT lang, pred, count(*) AS n_docs,
           CAST(sum(n_terms) AS BIGINT) AS total_terms,
           round(avg(score_r), 3) AS avg_score,
           min(score_r) AS min_score,
           max(score_r) AS max_score
         FROM anchored GROUP BY lang, pred ORDER BY lang, pred""",
    // Posting statistics with the order-independent checksum: every
    // posting hashes independently (md5 prefix -> 40-bit int) and the
    // per-term SUM pins the exact posting set — no list_agg ordering to
    // disagree on.
    "q129_postings" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(text, '\s+'), x -> x <> '')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2)
         SELECT term, count(*) AS df,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc,
           CAST(sum(CAST(concat('0x', substr(md5(
             concat(CAST(doc_id AS VARCHAR), ':', CAST(tf AS VARCHAR))),
             1, 10)) AS BIGINT)) AS BIGINT) AS posting_checksum
         FROM tf GROUP BY term ORDER BY df DESC, term LIMIT 100""",
    // Both retrieval arms replicated (BM25 = the q127 CTEs with the
    // query table drawn from the corpus itself; dense = the q27 cosine
    // pattern), then RRF: coalesce(1/(60+rnk), 0) per arm, sparse term
    // added FIRST (the engine's addition order), -1 sentinels for an
    // absent arm. Every fused score is one division + one addition of
    // exact-integer-derived doubles — bit-identical across engines.
    "q130_rrf_hybrid" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(text, '\s+'), x -> x <> '')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         st AS (SELECT count(*) AS n_docs FROM documents),
         tot AS (SELECT CAST(sum(tf) AS BIGINT) AS t FROM tf),
         qdocs AS (
           SELECT doc_id AS query_id, text AS query_text
           FROM documents WHERE doc_id < 5),
         qterms AS (
           SELECT DISTINCT query_id, term FROM (
             SELECT query_id, unnest(list_filter(
               regexp_split_to_array(query_text, '\s+'), x -> x <> '')) AS term
             FROM qdocs)),
         bscored AS (
           SELECT qt.query_id, tf.doc_id,
             sum(
               ln(1.0 + (st.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)) *
               (tf.tf * (1.2 + 1.0) /
                 (tf.tf + 1.2 * (1.0 - 0.75 +
                   0.75 * dl.dl / (tot.t * 1.0 / st.n_docs))))) AS score
           FROM qterms qt
           JOIN dfreq USING (term)
           JOIN tf USING (term)
           JOIN dl USING (doc_id)
           CROSS JOIN st CROSS JOIN tot
           GROUP BY 1, 2),
         sp AS (
           SELECT query_id, doc_id, rnk FROM (
             SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, doc_id) AS rnk
             FROM bscored)
           WHERE rnk <= 20),
         qv AS (
           SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
           FROM embeddings WHERE vec_id < 5),
         cv AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
         de AS (
           SELECT qid, id, rnk FROM (
             SELECT qid, id,
               row_number() OVER (PARTITION BY qid
                 ORDER BY sim DESC, id) AS rnk
             FROM (
               SELECT qid, id, list_cosine_similarity(qvec, vec) AS sim
               FROM qv, cv WHERE qid <> id))
           WHERE rnk <= 20),
         f AS (
           SELECT coalesce(sp.query_id, de.qid) AS query_id,
             coalesce(sp.doc_id, de.id) AS doc_id,
             coalesce(1.0 / (60 + sp.rnk), 0.0) +
               coalesce(1.0 / (60 + de.rnk), 0.0) AS rrf,
             coalesce(sp.rnk, -1) AS rnk_sparse,
             coalesce(de.rnk, -1) AS rnk_dense
           FROM sp FULL JOIN de
             ON de.qid = sp.query_id AND de.id = sp.doc_id),
         rk AS (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY rrf DESC, doc_id) AS rnk
           FROM f)
         SELECT query_id, rnk, doc_id, round(rrf, 6) AS rrf_score,
           rnk_sparse, rnk_dense
         FROM rk WHERE rnk <= 10 ORDER BY query_id, rnk""",
    // The whole CDC merge replicated relationally: changed ids (deletes
    // + update targets; insert ids are fresh) anti-join the corpus,
    // upsert payloads union in with recomputed n_chars. NULL-text rows
    // on the revision strides stay NULL through || and length() on both
    // engines, so the aggregates skip them identically.
    "q132_changeset_merge" ->
      """WITH chids AS (
           SELECT doc_id FROM documents WHERE doc_id % 10 IN (3, 4)
           UNION ALL
           SELECT doc_id + 1000000 FROM documents WHERE doc_id % 10 = 5),
         ups AS (
           SELECT doc_id, 'rev2 ' || text AS text, lang, source,
             CAST(length('rev2 ' || text) AS BIGINT) AS n_chars
           FROM documents WHERE doc_id % 10 = 4
           UNION ALL
           SELECT doc_id + 1000000, 'insert ' || text, lang, source,
             CAST(length('insert ' || text) AS BIGINT)
           FROM documents WHERE doc_id % 10 = 5),
         merged AS (
           SELECT doc_id, text, lang, source, n_chars FROM documents
           WHERE doc_id NOT IN (SELECT doc_id FROM chids)
           UNION ALL
           SELECT * FROM ups)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_sum,
           count(DISTINCT md5(text)) AS n_distinct
         FROM merged GROUP BY lang ORDER BY lang""",
    // Positional-posting phrase match replicated join-for-join: 1-based
    // positions on BOTH sides make base = pos - idx identical to the
    // engine's 0-based arithmetic, and every output column is an exact
    // integer.
    "q135_phrase_search" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
             x -> x <> '') AS l
           FROM documents),
         posting AS (
           SELECT doc_id, unnest(l) AS term,
             generate_subscripts(l, 1) AS pos
           FROM toks),
         p(phrase_id, phrase_text) AS (VALUES
           (CAST(1 AS BIGINT), 'batch batch'),
           (CAST(2 AS BIGINT), 'merge line'),
           (CAST(3 AS BIGINT), 'spark window merge'),
           (CAST(4 AS BIGINT), 'slow join sort'),
           (CAST(5 AS BIGINT), 'data data')),
         pt AS (
           SELECT phrase_id, len(pl) AS plen, unnest(pl) AS term,
             generate_subscripts(pl, 1) AS idx
           FROM (SELECT phrase_id, list_filter(
             regexp_split_to_array(phrase_text, '\s+'), x -> x <> '') AS pl
             FROM p)),
         occ AS (
           SELECT phrase_id, plen, doc_id, pos - idx AS base,
             count(DISTINCT idx) AS n_idx
           FROM posting JOIN pt USING (term)
           GROUP BY 1, 2, 3, 4)
         SELECT phrase_id, doc_id AS id, count(*) AS n_occurrences,
           CAST(min(base) AS BIGINT) AS first_pos
         FROM occ WHERE base >= 0 AND n_idx = plen
         GROUP BY 1, 2 ORDER BY phrase_id, id""",
    // The whole stupid-backoff model in SQL: train-split n-gram counts,
    // held-out trigrams joined to every tier's table, the SAME mirrored
    // float trees (c3/c2, 0.4·(c2/c1), 0.4·0.4·((c1+1)/(N+V))) before
    // log2, per-doc round(avg,4) then the q84-shape lang rollup. Tier
    // hit counts are integers — the branch decisions themselves are
    // gate-checked.
    "q136_backoff_lm" ->
      """WITH tt AS (
           SELECT list_filter(regexp_split_to_array(text, '\s+'),
             x -> x <> '') AS l
           FROM documents WHERE doc_id % 5 <> 0),
         c1 AS (
           SELECT t AS w, count(*) AS c1
           FROM (SELECT unnest(l) AS t FROM tt) GROUP BY 1),
         c2 AS (
           SELECT bg, count(*) AS c2 FROM (
             SELECT unnest([l[i] || ' ' || l[i+1]
               for i in range(1, len(l))]) AS bg
             FROM tt WHERE len(l) >= 2) GROUP BY 1),
         c3 AS (
           SELECT tg, count(*) AS c3 FROM (
             SELECT unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
               for i in range(1, len(l) - 1)]) AS tg
             FROM tt WHERE len(l) >= 3) GROUP BY 1),
         nn AS (
           SELECT CAST(sum(len(l)) AS DOUBLE) AS n FROM tt),
         vv AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM c1),
         ht AS (
           SELECT doc_id, lang, list_filter(
             regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
           FROM documents WHERE doc_id % 5 = 0),
         htris AS (
           SELECT doc_id, lang, unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
             for i in range(1, len(l) - 1)]) AS g
           FROM ht WHERE len(l) >= 3),
         parts AS (
           SELECT doc_id, lang, g,
             split_part(g, ' ', 1) || ' ' || split_part(g, ' ', 2) AS ctx,
             split_part(g, ' ', 2) || ' ' || split_part(g, ' ', 3) AS tl,
             split_part(g, ' ', 2) AS w2, split_part(g, ' ', 3) AS w3
           FROM htris),
         scored AS (
           SELECT doc_id, lang,
             CASE WHEN c3.c3 IS NOT NULL
                    THEN log2(c3.c3 * 1.0 / cctx.c2)
                  WHEN ctl.c2 IS NOT NULL
                    THEN log2(0.4 * (ctl.c2 * 1.0 / cw2.c1))
                  ELSE log2(0.4 * 0.4 *
                    ((coalesce(cw3.c1, 0) + 1) * 1.0 / (nn.n + vv.v)))
             END AS lp,
             CASE WHEN c3.c3 IS NOT NULL THEN 'tri'
                  WHEN ctl.c2 IS NOT NULL THEN 'bi'
                  ELSE 'uni' END AS tier
           FROM parts
           LEFT JOIN c3 ON parts.g = c3.tg
           LEFT JOIN c2 cctx ON parts.ctx = cctx.bg
           LEFT JOIN c2 ctl ON parts.tl = ctl.bg
           LEFT JOIN c1 cw2 ON parts.w2 = cw2.w
           LEFT JOIN c1 cw3 ON parts.w3 = cw3.w
           CROSS JOIN nn CROSS JOIN vv),
         perdoc AS (
           SELECT doc_id, lang, count(*) AS n_trigrams,
             sum(CASE WHEN tier = 'tri' THEN 1 ELSE 0 END) AS n_tri,
             sum(CASE WHEN tier = 'bi' THEN 1 ELSE 0 END) AS n_bi,
             sum(CASE WHEN tier = 'uni' THEN 1 ELSE 0 END) AS n_uni,
             round(avg(lp), 4) AS avg_lp
           FROM scored GROUP BY 1, 2)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(n_trigrams) AS BIGINT) AS total_trigrams,
           CAST(sum(n_tri) AS BIGINT) AS tri_hits,
           CAST(sum(n_bi) AS BIGINT) AS bi_hits,
           CAST(sum(n_uni) AS BIGINT) AS uni_hits,
           round(avg(avg_lp), 3) AS avg_score,
           min(avg_lp) AS min_score, max(avg_lp) AS max_score
         FROM perdoc GROUP BY lang ORDER BY lang""",
    // Centroid distances replicated through the same explode -> per-dim
    // mean -> Σ(x−c)² path; ranks on raw doubles (q27 precedent),
    // emitted values rounded to 4.
    "q137_emb_outliers" ->
      """WITH e AS (
           SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
         dims AS (
           SELECT label, vec_id, generate_subscripts(v, 1) AS dim,
             unnest(v) AS x
           FROM e),
         cent AS (
           SELECT label, dim, avg(x) AS c FROM dims GROUP BY 1, 2),
         dist AS (
           SELECT d.label, d.vec_id,
             sqrt(sum((d.x - cent.c) * (d.x - cent.c))) AS d
           FROM dims d JOIN cent ON d.label = cent.label AND d.dim = cent.dim
           GROUP BY 1, 2),
         mom AS (
           SELECT label, avg(d) AS mean_d, stddev_pop(d) AS sd_d
           FROM dist GROUP BY 1),
         r AS (
           SELECT dist.label, vec_id, d, mean_d, sd_d,
             CAST(row_number() OVER (PARTITION BY dist.label
               ORDER BY d DESC, vec_id) AS INTEGER) AS rnk
           FROM dist JOIN mom ON dist.label = mom.label)
         SELECT label AS grp, rnk, vec_id AS id, round(d, 4) AS dist,
           round(CASE WHEN sd_d > 0 THEN (d - mean_d) / sd_d
                      ELSE 0.0 END, 4) AS z
         FROM r WHERE rnk <= 5 ORDER BY grp, rnk""",
    // Containment replicated on raw 3-gram shingle SETS (the engine
    // intersects 64-bit hashed sets — identical cardinalities absent a
    // 2^-64 collision, the q26 precedent). Haystack token lists are
    // list_concat of the two source docs because tokens of 'A || " " || B'
    // ARE tokens(A) ++ tokens(B); boundary-spanning shingles emerge from
    // the comprehension over the concatenated list exactly as the engine
    // sees them in the concatenated text.
    "q138_containment" ->
      """WITH tk AS (
           SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
             x -> x <> '') AS l
           FROM documents),
         nsh AS (
           SELECT doc_id, list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
             for i in range(1, len(l) - 1)]) AS s
           FROM tk WHERE doc_id % 10 = 2 AND len(l) >= 3),
         hsh AS (
           SELECT h.doc_id, list_distinct([cl[i] || ' ' || cl[i+1] || ' ' || cl[i+2]
             for i in range(1, len(cl) - 1)]) AS s
           FROM (
             SELECT h.doc_id, list_concat(h.l, q.l) AS cl
             FROM tk h JOIN (
               SELECT doc_id + 5 AS doc_id, l FROM tk WHERE doc_id % 10 = 2) q
               USING (doc_id)
             WHERE h.doc_id % 10 = 7) h
           WHERE len(cl) >= 3),
         pairs AS (
           SELECT n.doc_id AS id_a, h.doc_id AS id_b,
             CAST(len(n.s) AS BIGINT) AS n_a,
             CAST(len(list_intersect(n.s, h.s)) AS BIGINT) AS inter
           FROM nsh n CROSS JOIN hsh h)
         SELECT id_a, id_b, n_a, inter,
           round(inter * 1.0 / n_a, 4) AS containment
         FROM pairs WHERE inter * 1.0 / n_a >= 0.8
         ORDER BY id_a, id_b""",
    // The chunker replicated cut-for-cut: interior 1-based gram starts
    // i in [2, len-2] cut when the md5-prefix integer of the 3-gram is
    // divisible by 16 (the q42 md5-int rule); starts/ends bracket the
    // cuts; every chunk is rebuilt and re-digested. range(2, len-1) is
    // empty for len <= 3 — short docs are one chunk, like the engine.
    "q139_cdc_chunks" ->
      """WITH toks AS (
           SELECT doc_id, lang, list_filter(
             regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         cuts AS (
           SELECT doc_id, lang, l,
             [i - 1 FOR i IN range(2, len(l) - 1)
                IF CAST(concat('0x', substr(md5(
                     array_to_string(l[i:i+2], ' ')), 1, 8)) AS BIGINT)
                   % 16 = 0] AS c
           FROM toks WHERE len(l) > 0),
         spans AS (
           SELECT doc_id, lang, l,
             list_prepend(0, c) AS s, list_append(c, len(l)) AS e
           FROM cuts),
         chunks AS (
           SELECT doc_id, lang,
             unnest([array_to_string(l[s[j]+1 : e[j]], ' ')
               FOR j IN range(1, len(s) + 1)]) AS chunk_text
           FROM spans),
         cstats AS (
           SELECT doc_id, lang, md5(chunk_text) AS d,
             len(list_filter(regexp_split_to_array(chunk_text, '\s+'),
               x -> x <> '')) AS nt
           FROM chunks),
         perd AS (
           SELECT lang, d, count(*) AS copies,
             CAST(sum(nt) AS BIGINT) AS tok
           FROM cstats GROUP BY 1, 2),
         agg1 AS (
           SELECT lang, CAST(sum(copies) AS BIGINT) AS n_chunks,
             count(*) AS n_distinct,
             CAST(sum(tok) AS BIGINT) AS total_tokens,
             CAST(max(copies) AS BIGINT) AS max_copies
           FROM perd GROUP BY 1),
         agg2 AS (
           SELECT lang, count(DISTINCT doc_id) AS n_docs
           FROM cstats GROUP BY 1)
         SELECT lang, n_docs, n_chunks, n_distinct, total_tokens,
           max_copies
         FROM agg1 JOIN agg2 USING (lang) ORDER BY lang""",
    // Four BPE rounds unrolled (the q124 greedy-unroll pattern): each
    // round counts adjacent pairs, elects (cnt DESC, a, b), and applies
    // the merge as the SAME string fold the engine runs — the last
    // emitted token is the accumulator's suffix after chr(31) (tokens
    // are \S+, so the separator can't occur inside one), and appending
    // "_b" merges it. list_reduce seeds from l[1], exactly like the
    // engine's aggregate over slice(l, 2, ...).
    "q140_bpe_merges" ->
      """WITH r0 AS (
           -- chr(31) is the engine's fold separator and NOT regex
           -- whitespace: both engines fold it to a space BEFORE
           -- tokenizing so it can never survive inside a token
           SELECT list_filter(regexp_split_to_array(
               replace(text, chr(31), ' '), '\s+'),
             x -> x <> '') AS l
           FROM documents
           WHERE len(list_filter(regexp_split_to_array(
               replace(text, chr(31), ' '), '\s+'),
             x -> x <> '')) > 0),
         p1 AS (SELECT p.a AS a, p.b AS b, count(*) AS cnt FROM (
             SELECT unnest([{'a': l[i], 'b': l[i+1]}
               FOR i IN range(1, len(l))]) AS p
             FROM r0 WHERE len(l) >= 2) GROUP BY 1, 2),
         m1 AS (SELECT a, b, cnt FROM p1 ORDER BY cnt DESC, a, b LIMIT 1),
         r1 AS (SELECT CASE WHEN len(l) <= 1 THEN l
             ELSE string_split(list_reduce(l,
               (acc, x) -> CASE WHEN (acc = m1.a OR
                   ends_with(acc, chr(31) || m1.a)) AND x = m1.b
                 THEN acc || '_' || m1.b
                 ELSE acc || chr(31) || x END), chr(31)) END AS l
           FROM r0 CROSS JOIN m1),
         p2 AS (SELECT p.a AS a, p.b AS b, count(*) AS cnt FROM (
             SELECT unnest([{'a': l[i], 'b': l[i+1]}
               FOR i IN range(1, len(l))]) AS p
             FROM r1 WHERE len(l) >= 2) GROUP BY 1, 2),
         m2 AS (SELECT a, b, cnt FROM p2 ORDER BY cnt DESC, a, b LIMIT 1),
         r2 AS (SELECT CASE WHEN len(l) <= 1 THEN l
             ELSE string_split(list_reduce(l,
               (acc, x) -> CASE WHEN (acc = m2.a OR
                   ends_with(acc, chr(31) || m2.a)) AND x = m2.b
                 THEN acc || '_' || m2.b
                 ELSE acc || chr(31) || x END), chr(31)) END AS l
           FROM r1 CROSS JOIN m2),
         p3 AS (SELECT p.a AS a, p.b AS b, count(*) AS cnt FROM (
             SELECT unnest([{'a': l[i], 'b': l[i+1]}
               FOR i IN range(1, len(l))]) AS p
             FROM r2 WHERE len(l) >= 2) GROUP BY 1, 2),
         m3 AS (SELECT a, b, cnt FROM p3 ORDER BY cnt DESC, a, b LIMIT 1),
         r3 AS (SELECT CASE WHEN len(l) <= 1 THEN l
             ELSE string_split(list_reduce(l,
               (acc, x) -> CASE WHEN (acc = m3.a OR
                   ends_with(acc, chr(31) || m3.a)) AND x = m3.b
                 THEN acc || '_' || m3.b
                 ELSE acc || chr(31) || x END), chr(31)) END AS l
           FROM r2 CROSS JOIN m3),
         p4 AS (SELECT p.a AS a, p.b AS b, count(*) AS cnt FROM (
             SELECT unnest([{'a': l[i], 'b': l[i+1]}
               FOR i IN range(1, len(l))]) AS p
             FROM r3 WHERE len(l) >= 2) GROUP BY 1, 2),
         m4 AS (SELECT a, b, cnt FROM p4 ORDER BY cnt DESC, a, b LIMIT 1),
         r4 AS (SELECT CASE WHEN len(l) <= 1 THEN l
             ELSE string_split(list_reduce(l,
               (acc, x) -> CASE WHEN (acc = m4.a OR
                   ends_with(acc, chr(31) || m4.a)) AND x = m4.b
                 THEN acc || '_' || m4.b
                 ELSE acc || chr(31) || x END), chr(31)) END AS l
           FROM r3 CROSS JOIN m4)
         SELECT 1 AS round, m1.a AS pair_a, m1.b AS pair_b,
           CAST(m1.cnt AS BIGINT) AS pair_count,
           (SELECT CAST(sum(len(l)) AS BIGINT) FROM r1) AS tokens_after
         FROM m1
         UNION ALL
         SELECT 2, m2.a, m2.b, CAST(m2.cnt AS BIGINT),
           (SELECT CAST(sum(len(l)) AS BIGINT) FROM r2) FROM m2
         UNION ALL
         SELECT 3, m3.a, m3.b, CAST(m3.cnt AS BIGINT),
           (SELECT CAST(sum(len(l)) AS BIGINT) FROM r3) FROM m3
         UNION ALL
         SELECT 4, m4.a, m4.b, CAST(m4.cnt AS BIGINT),
           (SELECT CAST(sum(len(l)) AS BIGINT) FROM r4) FROM m4
         ORDER BY round""",
    // The salted two-phase aggregate must collapse to the plain
    // aggregate — the oracle IS the plain aggregate.
    "q141_salted_agg" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(event_id) AS BIGINT) AS id_sum,
           min(user_id) AS min_user, max(user_id) AS max_user
         FROM events GROUP BY event_type ORDER BY event_type""",
    // Frame sampling replicated on VARCHAR under the shared ASCII guard
    // (octet == char length), so 1-based char offsets ARE byte offsets;
    // ceil(n/16) chunks include the partial tail, every 4th kept, same
    // md5-prefix checksum rule.
    "q142_frame_sample" ->
      """WITH d AS (
           SELECT source, doc_id, text, length(text) AS n
           FROM documents
           WHERE octet_length(encode(text)) = length(text)
             AND length(text) > 0),
         ch AS (
           SELECT source, doc_id,
             unnest([j FOR j IN range(0, CAST(ceil(n / 16.0) AS INTEGER))
                     IF j % 4 = 0]) AS idx,
             text
           FROM d),
         fr AS (
           SELECT source, doc_id,
             substring(text, idx * 16 + 1, 16) AS fb
           FROM ch)
         SELECT source, count(DISTINCT doc_id) AS n_docs,
           count(*) AS sampled_chunks,
           CAST(sum(length(fb)) AS BIGINT) AS sampled_bytes,
           CAST(sum(CAST(concat('0x', substr(md5(fb), 1, 8)) AS BIGINT))
             AS BIGINT) AS checksum_sum
         FROM fr GROUP BY source ORDER BY source""",
    // Char-trigram multinomial NB replicated end to end: the planted
    // marker tail, per-gram per-class add-one counts over the seed
    // vocabulary, ln priors and log-likelihood weights (IEEE ln of
    // exact-integer ratios, the q128 recipe), argmax + runner-up margin
    // via the same (score DESC, lang) window, aggregated over
    // rounded-to-4 per-doc scores exactly as the engine does.
    "q144_lang_id" -> LangIdOracleSql,
    // Train-then-encode replicated end to end: the q140 fold chain
    // carrying doc ids (token-less docs train nothing and encode to
    // empty arrays — the pair CTEs' len>=2 guard makes the training
    // elections identical to q140's filtered chain), then the per-lang
    // profile of the encoded token stream. All integers.
    "q146_bpe_encode" ->
      """WITH r0 AS (
           SELECT doc_id, lang, list_filter(regexp_split_to_array(
               replace(text, chr(31), ' '), '\s+'), x -> x <> '') AS l
           FROM documents),
         p1 AS (SELECT p.a AS a, p.b AS b, count(*) AS cnt FROM (
             SELECT unnest([{'a': l[i], 'b': l[i+1]}
               FOR i IN range(1, len(l))]) AS p
             FROM r0 WHERE len(l) >= 2) GROUP BY 1, 2),
         m1 AS (SELECT a, b FROM p1 ORDER BY cnt DESC, a, b LIMIT 1),
         r1 AS (SELECT doc_id, lang, CASE WHEN len(l) <= 1 THEN l
             ELSE string_split(list_reduce(l,
               (acc, x) -> CASE WHEN (acc = m1.a OR
                   ends_with(acc, chr(31) || m1.a)) AND x = m1.b
                 THEN acc || '_' || m1.b
                 ELSE acc || chr(31) || x END), chr(31)) END AS l
           FROM r0 CROSS JOIN m1),
         p2 AS (SELECT p.a AS a, p.b AS b, count(*) AS cnt FROM (
             SELECT unnest([{'a': l[i], 'b': l[i+1]}
               FOR i IN range(1, len(l))]) AS p
             FROM r1 WHERE len(l) >= 2) GROUP BY 1, 2),
         m2 AS (SELECT a, b FROM p2 ORDER BY cnt DESC, a, b LIMIT 1),
         r2 AS (SELECT doc_id, lang, CASE WHEN len(l) <= 1 THEN l
             ELSE string_split(list_reduce(l,
               (acc, x) -> CASE WHEN (acc = m2.a OR
                   ends_with(acc, chr(31) || m2.a)) AND x = m2.b
                 THEN acc || '_' || m2.b
                 ELSE acc || chr(31) || x END), chr(31)) END AS l
           FROM r1 CROSS JOIN m2),
         p3 AS (SELECT p.a AS a, p.b AS b, count(*) AS cnt FROM (
             SELECT unnest([{'a': l[i], 'b': l[i+1]}
               FOR i IN range(1, len(l))]) AS p
             FROM r2 WHERE len(l) >= 2) GROUP BY 1, 2),
         m3 AS (SELECT a, b FROM p3 ORDER BY cnt DESC, a, b LIMIT 1),
         r3 AS (SELECT doc_id, lang, CASE WHEN len(l) <= 1 THEN l
             ELSE string_split(list_reduce(l,
               (acc, x) -> CASE WHEN (acc = m3.a OR
                   ends_with(acc, chr(31) || m3.a)) AND x = m3.b
                 THEN acc || '_' || m3.b
                 ELSE acc || chr(31) || x END), chr(31)) END AS l
           FROM r2 CROSS JOIN m3),
         p4 AS (SELECT p.a AS a, p.b AS b, count(*) AS cnt FROM (
             SELECT unnest([{'a': l[i], 'b': l[i+1]}
               FOR i IN range(1, len(l))]) AS p
             FROM r3 WHERE len(l) >= 2) GROUP BY 1, 2),
         m4 AS (SELECT a, b FROM p4 ORDER BY cnt DESC, a, b LIMIT 1),
         r4 AS (SELECT doc_id, lang, CASE WHEN len(l) <= 1 THEN l
             ELSE string_split(list_reduce(l,
               (acc, x) -> CASE WHEN (acc = m4.a OR
                   ends_with(acc, chr(31) || m4.a)) AND x = m4.b
                 THEN acc || '_' || m4.b
                 ELSE acc || chr(31) || x END), chr(31)) END AS l
           FROM r3 CROSS JOIN m4)
         SELECT lang, count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_tokens,
           count(DISTINCT tok) AS n_vocab,
           CAST(sum(CASE WHEN contains(tok, '_') THEN 1 ELSE 0 END)
             AS BIGINT) AS merged_occurrences
         FROM (SELECT doc_id, lang, unnest(l) AS tok FROM r4)
         GROUP BY lang ORDER BY lang""",
    // q146's train+encode chain, then q51's greedy budget packing over
    // the ENCODED lengths (budget 256, 8 id-mod shards).
    "q150_tokenize_pack" ->
      """WITH r0 AS (
           SELECT doc_id, list_filter(regexp_split_to_array(
               replace(text, chr(31), ' '), '\s+'), x -> x <> '') AS l
           FROM documents),
         p1 AS (SELECT p.a AS a, p.b AS b, count(*) AS cnt FROM (
             SELECT unnest([{'a': l[i], 'b': l[i+1]}
               FOR i IN range(1, len(l))]) AS p
             FROM r0 WHERE len(l) >= 2) GROUP BY 1, 2),
         m1 AS (SELECT a, b FROM p1 ORDER BY cnt DESC, a, b LIMIT 1),
         r1 AS (SELECT doc_id, CASE WHEN len(l) <= 1 THEN l
             ELSE string_split(list_reduce(l,
               (acc, x) -> CASE WHEN (acc = m1.a OR
                   ends_with(acc, chr(31) || m1.a)) AND x = m1.b
                 THEN acc || '_' || m1.b
                 ELSE acc || chr(31) || x END), chr(31)) END AS l
           FROM r0 CROSS JOIN m1),
         p2 AS (SELECT p.a AS a, p.b AS b, count(*) AS cnt FROM (
             SELECT unnest([{'a': l[i], 'b': l[i+1]}
               FOR i IN range(1, len(l))]) AS p
             FROM r1 WHERE len(l) >= 2) GROUP BY 1, 2),
         m2 AS (SELECT a, b FROM p2 ORDER BY cnt DESC, a, b LIMIT 1),
         r2 AS (SELECT doc_id, CASE WHEN len(l) <= 1 THEN l
             ELSE string_split(list_reduce(l,
               (acc, x) -> CASE WHEN (acc = m2.a OR
                   ends_with(acc, chr(31) || m2.a)) AND x = m2.b
                 THEN acc || '_' || m2.b
                 ELSE acc || chr(31) || x END), chr(31)) END AS l
           FROM r1 CROSS JOIN m2),
         p3 AS (SELECT p.a AS a, p.b AS b, count(*) AS cnt FROM (
             SELECT unnest([{'a': l[i], 'b': l[i+1]}
               FOR i IN range(1, len(l))]) AS p
             FROM r2 WHERE len(l) >= 2) GROUP BY 1, 2),
         m3 AS (SELECT a, b FROM p3 ORDER BY cnt DESC, a, b LIMIT 1),
         r3 AS (SELECT doc_id, CASE WHEN len(l) <= 1 THEN l
             ELSE string_split(list_reduce(l,
               (acc, x) -> CASE WHEN (acc = m3.a OR
                   ends_with(acc, chr(31) || m3.a)) AND x = m3.b
                 THEN acc || '_' || m3.b
                 ELSE acc || chr(31) || x END), chr(31)) END AS l
           FROM r2 CROSS JOIN m3),
         p4 AS (SELECT p.a AS a, p.b AS b, count(*) AS cnt FROM (
             SELECT unnest([{'a': l[i], 'b': l[i+1]}
               FOR i IN range(1, len(l))]) AS p
             FROM r3 WHERE len(l) >= 2) GROUP BY 1, 2),
         m4 AS (SELECT a, b FROM p4 ORDER BY cnt DESC, a, b LIMIT 1),
         r4 AS (SELECT doc_id, CASE WHEN len(l) <= 1 THEN l
             ELSE string_split(list_reduce(l,
               (acc, x) -> CASE WHEN (acc = m4.a OR
                   ends_with(acc, chr(31) || m4.a)) AND x = m4.b
                 THEN acc || '_' || m4.b
                 ELSE acc || chr(31) || x END), chr(31)) END AS l
           FROM r3 CROSS JOIN m4),
         d AS (SELECT doc_id, doc_id % 8 AS shard,
                 CAST(len(l) AS BIGINT) AS n_toks FROM r4),
         p AS (
           SELECT shard, n_toks,
             CAST((sum(n_toks) OVER w - n_toks) // 256 AS BIGINT) AS pack
           FROM d
           WINDOW w AS (PARTITION BY shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING)),
         packs AS (
           SELECT shard, pack, count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS pack_tokens,
             greatest(CAST(sum(n_toks) AS BIGINT) - 256, 0)
               AS overflow_tokens
           FROM p GROUP BY shard, pack)
         SELECT shard, count(*) AS n_packs,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(pack_tokens) AS BIGINT) AS total_tokens,
           max(pack_tokens) AS max_pack_tokens,
           CAST(sum(overflow_tokens) AS BIGINT) AS total_overflow
         FROM packs GROUP BY shard ORDER BY shard""",
    // Model persistence is a storage concern, not semantics: scoring
    // against the saved files must equal in-session scoring — q144's
    // oracle, by reference (the q134/q143/q145 rationale for MODELS).
    "q151_lang_id_model" -> LangIdOracleSql,
    // The whole delete relationally: the read-back corpus must equal
    // the anti-join of the original against the doomed-key predicate.
    "q152_targeted_delete" ->
      """SELECT lang, count(*) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM documents
         WHERE NOT (doc_id % 7 = 0 OR lang = 'fr')
         GROUP BY lang ORDER BY lang""",
    // Ratio-margin bitext mining replicated: cross cosine scores, both
    // sides' 4-NN averages (avg over the available neighbors, ties to
    // the smaller id), margin = sim / mean of the two averages, per-src
    // argmax by margin, threshold 1.1 — all mirroring the engine's
    // expression tree; sim/margin round to 4 (the q35 anchoring).
    "q147_bitext_margin" ->
      """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         d AS (SELECT doc_id, lang FROM documents),
         s AS (SELECT e.id, e.v FROM e JOIN d ON d.doc_id = e.id
               WHERE d.lang = 'en'),
         t AS (SELECT e.id, e.v FROM e JOIN d ON d.doc_id = e.id
               WHERE d.lang = 'de'),
         sc AS (SELECT s.id AS src_id, t.id AS tgt_id,
                  list_cosine_similarity(s.v, t.v) AS sim
                FROM s CROSS JOIN t
                WHERE list_cosine_similarity(s.v, t.v) IS NOT NULL),
         fwd AS (SELECT * FROM (SELECT src_id, tgt_id, sim,
                  row_number() OVER (PARTITION BY src_id
                    ORDER BY sim DESC, tgt_id) AS r
                  FROM sc) WHERE r <= 4),
         srcavg AS (SELECT src_id, avg(sim) AS sa FROM fwd GROUP BY 1),
         bwd AS (SELECT * FROM (SELECT src_id, tgt_id, sim,
                  row_number() OVER (PARTITION BY tgt_id
                    ORDER BY sim DESC, src_id) AS r
                  FROM sc) WHERE r <= 4),
         tgtavg AS (SELECT tgt_id, avg(sim) AS ta FROM bwd GROUP BY 1),
         cand AS (SELECT f.src_id, f.tgt_id, f.sim,
                    f.sim / ((sa.sa + ta.ta) / 2) AS margin
                  FROM fwd f
                  JOIN srcavg sa ON sa.src_id = f.src_id
                  JOIN tgtavg ta ON ta.tgt_id = f.tgt_id
                  WHERE sa.sa + ta.ta <> 0),
         best AS (SELECT * FROM (SELECT src_id, tgt_id, sim, margin,
                    row_number() OVER (PARTITION BY src_id
                      ORDER BY margin DESC, tgt_id) AS rk
                  FROM cand) WHERE rk = 1 AND margin >= 1.1)
         SELECT src_id, tgt_id, round(sim, 4) AS sim,
           round(margin, 4) AS margin
         FROM best ORDER BY src_id"""
  )

  /** q190: the decode side read the pixels back through ImageIO; the
    * oracle never touches a codec — it re-derives every pixel of both
    * the original (w x h) raster and the 8x6 nearest-neighbor resample
    * from the synthesizer's closed-form pattern (r=(7x+3y+s)%256,
    * g=(5x+11y+2s)%256, b=(13x+y+5s)%256; resample src index =
    * dst*src/dst floor). Fixed series + filter instead of correlated
    * generate_series bounds (version-proof lateral).
    */
  private val ImageDecodeOracleSql: String =
    """WITH d AS (
           SELECT doc_id,
             CAST(16 + doc_id % 8 AS INT) AS w,
             CAST(12 + doc_id % 5 AS INT) AS h,
             CAST(doc_id % 256 AS INT) AS s
           FROM documents WHERE doc_id % 37 = 0),
         px AS (
           SELECT d.doc_id,
             CAST(sum((7*gx.x + 3*gy.y + d.s) % 256) AS BIGINT) AS sum_r,
             CAST(sum((5*gx.x + 11*gy.y + 2*d.s) % 256) AS BIGINT) AS sum_g,
             CAST(sum((13*gx.x + gy.y + 5*d.s) % 256) AS BIGINT) AS sum_b
           FROM d, generate_series(0, 22) AS gx(x),
                generate_series(0, 15) AS gy(y)
           WHERE gx.x < d.w AND gy.y < d.h
           GROUP BY d.doc_id),
         rs AS (
           SELECT d.doc_id,
             CAST(sum((7*((gx.x*d.w)//8) + 3*((gy.y*d.h)//6) + d.s) % 256)
               AS BIGINT) AS rs_sum_r,
             CAST(sum((5*((gx.x*d.w)//8) + 11*((gy.y*d.h)//6) + 2*d.s) % 256)
               AS BIGINT) AS rs_sum_g,
             CAST(sum((13*((gx.x*d.w)//8) + ((gy.y*d.h)//6) + 5*d.s) % 256)
               AS BIGINT) AS rs_sum_b
           FROM d, generate_series(0, 7) AS gx(x),
                generate_series(0, 5) AS gy(y)
           GROUP BY d.doc_id)
         SELECT d.doc_id AS doc_id, 'png' AS fmt,
           d.w AS width, d.h AS height,
           px.sum_r, px.sum_g, px.sum_b,
           rs.rs_sum_r, rs.rs_sum_g, rs.rs_sum_b
         FROM d JOIN px USING (doc_id) JOIN rs USING (doc_id)
         ORDER BY doc_id"""

  /** q188 trains the same 4 merges, round-trips them through the
    * PERSISTED tokenizer artifact ([[graft.operators.TextAnalysis
    * .bpeSave]]/[[graft.operators.TextAnalysis.bpeLoad]]), and encodes
    * with the LOADED table — same oracle as q146 by reference (the
    * q134/q143 rationale: persistence is a storage concern, not
    * semantics; a lost, reordered, or truncated merge row would move
    * the encoded relation and break the hash).
    */
  val sql: Map[String, String] =
    base ++ Map(
      "q188_bpe_artifact" -> base("q146_bpe_encode"),
      "q190_image_decode" -> ImageDecodeOracleSql,
      // q191: the decode side parsed RIFF and folded every PCM sample;
      // the oracle is pure arithmetic on the id-derived square-wave
      // parameters (n % 4 == 0 by construction, so sum = 0 exactly,
      // sum_sq = n * amp^2, peak = amp).
      "q191_audio_decode" ->
        """WITH d AS (
             SELECT doc_id,
               CAST(8000 + (doc_id % 4) * 4000 AS INT) AS rate,
               CAST(500 + doc_id % 997 AS INT) AS amp,
               CAST(256 + (doc_id % 32) * 4 AS INT) AS n
             FROM documents WHERE doc_id % 41 = 0)
           SELECT doc_id, 'wav' AS fmt, rate AS sample_rate,
             CAST(1 AS INT) AS channels,
             CAST(n AS BIGINT) AS n_samples,
             amp AS peak,
             CAST(0 AS BIGINT) AS sum_pcm,
             CAST(n AS BIGINT) * amp * amp AS sum_sq
           FROM d ORDER BY doc_id""",
      // q192: per-pixel re-derivation of the 4x3 grid descriptor — the
      // pattern channels summed into cells assigned by the SAME floor
      // arithmetic ((y*3)//h * 4 + (x*4)//w). posexplode is 0-based.
      "q192_image_grid_features" ->
        """WITH d AS (
             SELECT doc_id,
               CAST(16 + doc_id % 8 AS INT) AS w,
               CAST(12 + doc_id % 5 AS INT) AS h,
               CAST(doc_id % 256 AS INT) AS s
             FROM documents WHERE doc_id % 29 = 0),
           px AS (
             SELECT d.doc_id,
               ((gy.y * 3) // d.h) * 4 + (gx.x * 4) // d.w AS cell,
               (7*gx.x + 3*gy.y + d.s) % 256 +
                 (5*gx.x + 11*gy.y + 2*d.s) % 256 +
                 (13*gx.x + gy.y + 5*d.s) % 256 AS v
             FROM d, generate_series(0, 22) AS gx(x),
                  generate_series(0, 15) AS gy(y)
             WHERE gx.x < d.w AND gy.y < d.h)
           SELECT doc_id, CAST(cell AS INT) AS cell,
             CAST(sum(v) AS BIGINT) AS sum_rgb
           FROM px GROUP BY doc_id, cell
           ORDER BY doc_id, cell""",
      // q193: every 2nd frame of the DIB clip, channel sums re-derived
      // per pixel from the frame-extended pattern (f series bounded by
      // the max 3 + 3 frames; stride = even frame indexes).
      "q193_video_frame_decode" ->
        """WITH d AS (
             SELECT doc_id,
               CAST(16 + doc_id % 6 AS INT) AS w,
               CAST(12 + doc_id % 4 AS INT) AS h,
               CAST(3 + doc_id % 4 AS INT) AS nf,
               CAST(doc_id % 256 AS INT) AS s
             FROM documents WHERE doc_id % 31 = 0),
           px AS (
             SELECT d.doc_id, gf.f AS frame_idx,
               CAST(sum((7*gx.x + 3*gy.y + d.s + 11*gf.f) % 256) AS BIGINT)
                 AS sum_r,
               CAST(sum((5*gx.x + 11*gy.y + 2*d.s + 17*gf.f) % 256) AS BIGINT)
                 AS sum_g,
               CAST(sum((13*gx.x + gy.y + 5*d.s + 23*gf.f) % 256) AS BIGINT)
                 AS sum_b
             FROM d, generate_series(0, 5) AS gf(f),
                  generate_series(0, 21) AS gx(x),
                  generate_series(0, 15) AS gy(y)
             WHERE gf.f < d.nf AND gf.f % 2 = 0
               AND gx.x < d.w AND gy.y < d.h
             GROUP BY d.doc_id, gf.f)
           SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
             sum_r, sum_g, sum_b
           FROM px ORDER BY doc_id, frame_idx""",
      // q196: the perceptual-hash pair relation IS the construction —
      // 3 pairs per planted group (base/re-level/upscale), nothing
      // else. Full recall AND precision ride the hash compare; the
      // hash values themselves are engine-side (the oracle pins the
      // pair RELATION, the spec pins the DCT against fixtures).
      "q196_image_phash_neardup" ->
        """WITH d AS (
             SELECT doc_id FROM documents
             WHERE doc_id % 20 = 0 AND doc_id < 500),
           p AS (
             SELECT doc_id*10 AS a, doc_id*10 + 1 AS b FROM d
             UNION ALL SELECT doc_id*10, doc_id*10 + 2 FROM d
             UNION ALL SELECT doc_id*10 + 1, doc_id*10 + 2 FROM d)
           SELECT CAST(a AS BIGINT) AS img_id_a, CAST(b AS BIGINT) AS img_id_b
           FROM p ORDER BY img_id_a, img_id_b""",
      // q201: first-arrival image dedup — accepted ids are EXACTLY the
      // construction's bases + genuinely-new uploads (re-leveled and
      // upscaled re-uploads share their base's dHash digest and must
      // refuse); n_dropped pins the rejection count.
      "q201_image_stream_dedup" ->
        """WITH d AS (
             SELECT doc_id FROM documents
             WHERE doc_id % 10 = 0 AND doc_id < 500),
           acc AS (
             SELECT doc_id AS v FROM d
             UNION ALL
             SELECT doc_id + 2000000 FROM d WHERE doc_id % 20 = 0),
           rows_out AS (
             SELECT 'accepted' AS kind, CAST(v AS BIGINT) AS v FROM acc
             UNION ALL
             SELECT 'n_dropped',
               CAST((SELECT count(*) FROM d WHERE doc_id % 20 = 0)
                 + (SELECT count(*) FROM d) AS BIGINT))
           SELECT kind, v FROM rows_out ORDER BY kind, v""",
      // q204: the commit-protocol estate audit over two lived-in
      // estates is expected EMPTY (per-class plants are drilled by
      // requires inside the gate and in EstateFsckSpec).
      "q204_estate_fsck" ->
        """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
           WHERE false""",
      // q205: the composed probe pinned at the composite cut recorded
      // after batch 1 — BM25 over the first-arrival survivors of
      // phases 0..1 ONLY (batch 2's churn on both roots is invisible
      // at the cut).
      "q205_composite_pin" -> bm25OracleOverCorpus(
        s"""SELECT doc_id, text FROM (
             SELECT doc_id, text,
               row_number() OVER (PARTITION BY md5(text)
                 ORDER BY ph, doc_id) AS rn
             FROM ($DedupStreamSql) WHERE ph <= 1) WHERE rn = 1"""),
      // q202: the pinned (time-travel) probe must equal the BM25
      // relation over EXACTLY the pre-delete corpus state — base
      // (0 mod 3) plus the appended batch (1 mod 3), no deletions.
      "q202_time_travel" ->
        bm25OracleOver("doc_id % 3 = 0 OR doc_id % 3 = 1"),
      // q206: the SAME pre-delete relation, reached through plain
      // spark.sql over `est206.<table> VERSION AS OF g` (the SQL
      // time-travel surface; library-vs-SQL equality is an in-gate
      // require).
      "q206_sql_time_travel" ->
        bm25OracleOver("doc_id % 3 = 0 OR doc_id % 3 = 1"),
      // q203: the raced ingest+compact estate must hold the WHOLE
      // embeddings table exactly once; the self-top1 violations row
      // must be absent.
      "q203_concurrent_writers" ->
        """SELECT 'corpus_rows' AS kind, CAST(count(*) AS BIGINT) AS n
           FROM embeddings""",
      // q198: violations expected empty; corpus_rows pins exactly-once
      // cardinality (junk erased, re-delivery skipped), queries_probed
      // non-vacuity.
      "q198_multimodal_stream_ingest" ->
        """SELECT 'corpus_rows' AS kind, CAST(count(*) AS BIGINT) AS n
           FROM documents WHERE doc_id % 8 = 0 AND doc_id < 19000
           UNION ALL
           SELECT 'queries_probed', CAST(count(*) AS BIGINT)
           FROM documents WHERE doc_id % 8 = 0 AND doc_id < 19000
           ORDER BY kind""",
      // q197: the audio chain's violation set is expected empty;
      // queries_probed pins non-vacuity (the q195 contract for audio).
      "q197_audio_ann_pipeline" ->
        """SELECT 'queries_probed' AS kind, CAST(count(*) AS BIGINT) AS n
           FROM documents WHERE doc_id % 20 = 0 AND doc_id < 500""",
      // q195: the image->features->IVF->probe chain's violation set is
      // expected empty; queries_probed pins non-vacuity (count over the
      // same capped slice).
      "q195_image_ann_pipeline" ->
        """SELECT 'queries_probed' AS kind, CAST(count(*) AS BIGINT) AS n
           FROM documents WHERE doc_id % 23 = 0 AND doc_id < 1280""",
      // q194: container triage metadata — id-derived clip parameters
      // straight back (BI_RGB uncompressed = fourcc 0, 24 bpp).
      "q194_video_meta" ->
        """SELECT doc_id,
             CAST(16 + doc_id % 6 AS INT) AS width,
             CAST(12 + doc_id % 4 AS INT) AS height,
             CAST(24 AS INT) AS bpp,
             CAST(0 AS INT) AS compression,
             CAST(3 + doc_id % 4 AS BIGINT) AS n_frames
           FROM documents WHERE doc_id % 31 = 0
           ORDER BY doc_id""")
}
