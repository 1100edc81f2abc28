package graft

import graft.ops.{GraphOps, TextOps, VectorOps}

/** Generators for the hard DuckDB oracle SQL in [[SparkEntry.oracleSql]]
  * — the queries whose kernels (FNV-1a, splitmix64, SimHash, MinHash,
  * sign-bit LSH, double-precision cosine) must be recomputed EXACTLY in
  * ANSI-ish SQL so the driver's DuckDB compare can hash-match them.
  *
  * Techniques (all validated value-identical at sf0.001/0.01/0.1):
  *  - unsigned 64-bit arithmetic in HUGEINT with explicit mod-2^64;
  *    full-width xor via a signed-BIGINT round-trip; multiplication by
  *    >2^63 constants via 32-bit limb splitting (mulmod);
  *  - deterministic constants (minhash seeds, LSH hyperplanes) are
  *    computed HERE from the same Scala code the operators use and
  *    embedded as SQL literals — one source of truth;
  *  - double-precision folds mirror Spark's aggregate() left fold via
  *    list_reduce(list_prepend(0.0, products)), so cosine similarities
  *    match bit-for-bit (products of float casts are exact in double);
  *  - integer-exact sign buckets (±floor(x·1000)) make LSH bucket ids
  *    engine-independent by construction.
  *
  * The documents corpus is ASCII + single-space-normalized (asserted
  * for the shipped testdata), so UTF-8 bytes == ascii(char) in the FNV
  * folds.
  */
private[graft] object OracleSqlGen {

  /** dedup_embedding similarity floor for the synthetic corpus — ONE
    * constant for the Spark call (Queries.dedupEmbedding) and the SQL
    * mirror below; a bare literal on either side desynchronizes them.
    */
  val DedupEmbeddingMinSimMicro = 300000L

  /** dedup_embedding hot-bucket cap — mirrored in the SQL below (a
    * corpus with a >cap bucket would otherwise diverge: Spark drops
    * the bucket's pairs, an uncapped oracle keeps them).
    */
  val DedupEmbeddingMaxBucket = 4096

  private val M64 = "18446744073709551616::HUGEINT"

  /** Signed BIGINT view of an unsigned HUGEINT (two's-complement wrap). */
  private def sb(a: String): String =
    s"(CASE WHEN ($a) >= 9223372036854775808::HUGEINT THEN CAST(($a) - $M64 AS BIGINT) ELSE CAST(($a) AS BIGINT) END)"

  /** Unsigned HUGEINT view of a signed BIGINT. */
  private def ub(a: String): String =
    s"(CASE WHEN ($a) < 0 THEN CAST(($a) AS HUGEINT) + $M64 ELSE CAST(($a) AS HUGEINT) END)"

  /** Full-width 64-bit xor of two unsigned HUGEINTs. */
  private def xor64(a: String, b: String): String = ub(s"xor(${sb(a)}, ${sb(b)})")

  /** (a * m) mod 2^64 for a < 2^64 and any 64-bit constant m, via
    * 32-bit limb split (the naive product can exceed HUGEINT range).
    */
  private def mulmod(a: String, m: String): String =
    s"((($a) % 4294967296::HUGEINT) * $m::HUGEINT + " +
      s"((((($a) // 4294967296::HUGEINT) * $m::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT)) % $M64"

  /** FNV-1a 64 over the ASCII bytes of string column `c`, as unsigned
    * HUGEINT (mirror of TextOps.fnv1a64).
    */
  private def fnvU(c: String): String =
    s"""list_reduce(
       |  list_prepend(14695981039346656037::HUGEINT,
       |    list_transform(range(1, length($c)+1),
       |      i -> CAST(ascii(substring($c, CAST(i AS INTEGER), 1)) AS HUGEINT))),
       |  (h, b) -> ((h - h % 256::HUGEINT + CAST(xor(CAST(h % 256::HUGEINT AS BIGINT), CAST(b AS BIGINT)) AS HUGEINT))
       |             * 1099511628211::HUGEINT) % $M64)""".stripMargin

  /** CTE chain `wo, fv, cnts, sh` computing sh(doc_id, simhash BIGINT)
    * for a CTE named `corpus(doc_id, text)` — the TextOps.simhash
    * mirror (FNV per distinct word, ±occurrences per bit, sign bit).
    */
  private val simhashCte: String =
    s"""wo AS (
       |  SELECT doc_id, w, count(*) AS occ
       |  FROM corpus, UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS u(w)
       |  GROUP BY doc_id, w),
       |fv AS (SELECT w, ${sb(fnvU("w"))} AS hs FROM (SELECT DISTINCT w FROM wo) dw),
       |cnts AS (
       |  SELECT wo.doc_id, bb.b,
       |         sum(CASE WHEN ((fv.hs >> CAST(bb.b AS INTEGER)) & 1) = 1 THEN occ ELSE -occ END) AS cnt
       |  FROM wo JOIN fv USING (w), UNNEST(range(64)) AS bb(b)
       |  GROUP BY wo.doc_id, bb.b),
       |sh AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN cnt > 0 THEN
       |      (CASE WHEN b = 63 THEN -9223372036854775808 ELSE (1::BIGINT << CAST(b AS INTEGER)) END)
       |      ELSE 0 END) AS BIGINT) AS simhash
       |  FROM cnts GROUP BY doc_id)""".stripMargin

  /** The mutated near-dup corpus (TextOps.corpusWithNearDups mirror):
    * every 10th doc reappears as doc_id+1e6 with the last word dropped.
    */
  private val nearDupCorpus: String =
    """corpus AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |         substring(text, 1, length(text) - instr(reverse(text), ' ')) AS text
      |  FROM documents WHERE doc_id % 10 = 0)""".stripMargin

  /** Left-fold dot product of two FLOAT[] columns in DOUBLE — the
    * exact mirror of VectorOps.dot (zip_with + aggregate left fold).
    */
  private[graft] def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(range(1, len($a)+1),
       |        i -> CAST($a[CAST(i AS INTEGER)] AS DOUBLE) * CAST($b[CAST(i AS INTEGER)] AS DOUBLE))),
       |      (acc, v) -> acc + v)""".stripMargin

  private def planesLit(planes: Array[Array[Float]]): String =
    planes.map(_.map(x => if (x >= 0) "1" else "-1").mkString("[", ",", "]"))
      .mkString("[", ",", "]")

  /** CTE chain ending in buckets(vec_id, bucketbits BIGINT): sign-bit
    * LSH over `embeddings` with the plane matrix embedded as literals;
    * integer-exact (±floor(x·1000)) like VectorOps.lshBucket.
    */
  private def bucketsCte(planes: Array[Array[Float]]): String =
    s"""vmilli AS (
       |  SELECT vec_id, dd.i,
       |         CAST(floor(CAST(embedding[CAST(dd.i AS INTEGER)+1] AS DOUBLE) * 1000.0) AS BIGINT) AS m
       |  FROM embeddings, UNNEST(range(len(embedding))) AS dd(i)),
       |plel AS (
       |  SELECT pp.p, dd.i, (${planesLit(planes)})[CAST(pp.p AS INTEGER)+1][CAST(dd.i AS INTEGER)+1] AS sign
       |  FROM UNNEST(range(${planes.length})) AS pp(p), UNNEST(range(64)) AS dd(i)),
       |sums AS (
       |  SELECT v.vec_id, p.p, sum(v.m * p.sign) AS s
       |  FROM vmilli v JOIN plel p ON v.i = p.i
       |  GROUP BY v.vec_id, p.p),
       |buckets AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN s >= 0 THEN (1::BIGINT << CAST(p AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucketbits
       |  FROM sums GROUP BY vec_id)""".stripMargin

  /** CTE chain ending in banded(vec_id, band, bucket): per-band sign-bit
    * LSH buckets with band b = consecutive plane slice
    * [b·planesPerBand, (b+1)·planesPerBand) — the VectorOps.bandBuckets
    * mirror. Unlike bucketsCte this never packs all planes into ONE
    * integer, so any table count works (16 tables × 9 planes = 144
    * bits > BIGINT).
    */
  private def bandedCte(planes: Array[Array[Float]], planesPerBand: Int): String =
    s"""vmilli AS (
       |  SELECT vec_id, dd.i,
       |         CAST(floor(CAST(embedding[CAST(dd.i AS INTEGER)+1] AS DOUBLE) * 1000.0) AS BIGINT) AS m
       |  FROM embeddings, UNNEST(range(len(embedding))) AS dd(i)),
       |plel AS (
       |  SELECT pp.p, dd.i, (${planesLit(planes)})[CAST(pp.p AS INTEGER)+1][CAST(dd.i AS INTEGER)+1] AS sign
       |  FROM UNNEST(range(${planes.length})) AS pp(p), UNNEST(range(64)) AS dd(i)),
       |sums AS (
       |  SELECT v.vec_id, p.p, sum(v.m * p.sign) AS s
       |  FROM vmilli v JOIN plel p ON v.i = p.i
       |  GROUP BY v.vec_id, p.p),
       |banded AS (
       |  SELECT vec_id, CAST(p // $planesPerBand AS INTEGER) AS band,
       |    CAST(sum(CASE WHEN s >= 0 THEN (1::BIGINT << CAST(p % $planesPerBand AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM sums GROUP BY vec_id, p // $planesPerBand)""".stripMargin

  /** CTE chain `${p}1..${p}6` applying splitmix64 to the unsigned
    * HUGEINT column `x` of CTE `src`, carrying `keys` through, ending
    * in column `hk` — one generated source for every query that needs
    * the splitmix kernel (minhash, mm_embed, strat_sample).
    */
  private def splitmixCtes(p: String, src: String, keys: String): String =
    s"""${p}1 AS (SELECT $keys, (x + 11400714819323198485::HUGEINT) % $M64 AS z1 FROM $src),
       |${p}2 AS (SELECT $keys, ${xor64("z1", "z1 // 1073741824::HUGEINT")} AS a1 FROM ${p}1),
       |${p}3 AS (SELECT $keys, ${mulmod("a1", "13787848793156543929")} AS z2 FROM ${p}2),
       |${p}4 AS (SELECT $keys, ${xor64("z2", "z2 // 134217728::HUGEINT")} AS a2 FROM ${p}3),
       |${p}5 AS (SELECT $keys, ${mulmod("a2", "10723151780598845931")} AS z3 FROM ${p}4),
       |${p}6 AS (SELECT $keys, ${xor64("z3", "z3 // 2147483648::HUGEINT")} AS hk FROM ${p}5)""".stripMargin

  /** 3-word shingle list of a text column (TextOps.shingles mirror for
    * texts with >= 3 words — guaranteed for this corpus).
    */
  private def shinglesSql(t: String): String =
    s"""list_transform(range(len(string_split($t,' '))-2),
       |      i -> string_split($t,' ')[i+1] || ' ' || string_split($t,' ')[i+2] || ' ' || string_split($t,' ')[i+3])""".stripMargin

  // -------------------------------------------------------------------
  // full oracle queries
  // -------------------------------------------------------------------

  val langId: String = {
    val vals = TextOps.langMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      s"('$lang', [${ms.map(m => "'" + m.replace("'", "''") + "'").mkString(",")}])"
    }.mkString(", ")
    s"""WITH lm(lang, markers) AS (VALUES $vals),
       |s AS (
       |  SELECT doc_id, lang,
       |    list_sum(list_transform(markers,
       |      m -> (length(t) - length(replace(t, m, ''))) // length(m))) AS score
       |  FROM (SELECT doc_id, lower(text) AS t FROM documents), lm),
       |r AS (SELECT doc_id, lang,
       |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
       |      FROM s)
       |SELECT doc_id, lang AS pred_lang FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  val docFingerprint: String = {
    val fpBody =
      s"""list_reduce(
         |    list_prepend(0::HUGEINT,
         |      list_transform(range(1, length(text)+1),
         |        i -> CAST(ascii(substring(text, CAST(i AS INTEGER), 1)) AS HUGEINT))),
         |    (h, b) -> (h * 1000003::HUGEINT + b) % $M64)""".stripMargin
    s"""WITH corpus AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents),
       |$simhashCte,
       |fp AS (SELECT doc_id, ${sb(fpBody)} AS fingerprint FROM corpus)
       |SELECT fp.doc_id, fp.fingerprint, sh.simhash
       |FROM fp JOIN sh USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  val dedupSimhash: String =
    s"""WITH $nearDupCorpus,
       |$simhashCte
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
       |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Winnowing near-dup mirror (TextOps.dedupWinnow recomputed
    * relationally): k-word grams FNV-hashed, per window of W gram
    * hashes the RIGHTMOST minimal hash selected (ORDER BY h ASC,
    * pos DESC — h is HUGEINT in [0, 2^64) so ASC IS unsigned order,
    * matching Spark's compareUnsigned; the tie rule genuinely fires
    * on looping docs where identical grams repeat inside one window),
    * distinct per doc, df-capped before the pair join, sizes counted
    * over the capped sets. All four geometry constants come from the
    * SAME Scala values the Spark kernel uses.
    */
  val dedupWinnow: String = {
    val k = TextOps.WinnowK
    val w = TextOps.WinnowW
    val gram =
      s"array_to_string(ws[CAST(u.i+1 AS INTEGER):CAST(u.i+$k AS INTEGER)], ' ')"
    s"""WITH $nearDupCorpus,
       |pw AS (SELECT doc_id,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM corpus),
       |g AS (
       |  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
       |    ${fnvU(gram)} AS h
       |  FROM pw, UNNEST(range(greatest(len(ws) - ${k - 1}, 0))) AS u(i)),
       |cnt AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id),
       |wins AS (SELECT doc_id, CAST(u.j AS BIGINT) AS j
       |         FROM cnt, UNNEST(range(greatest(ng - ${w - 1}, 0))) AS u(j)),
       |cand AS (
       |  SELECT wn.doc_id, wn.j, g.pos, g.h,
       |    row_number() OVER (PARTITION BY wn.doc_id, wn.j
       |      ORDER BY g.h ASC, g.pos DESC) AS rn
       |  FROM wins wn JOIN g ON g.doc_id = wn.doc_id
       |    AND g.pos BETWEEN wn.j AND wn.j + ${w - 1}),
       |fps AS (SELECT DISTINCT doc_id, h FROM cand WHERE rn = 1),
       |dfc AS (SELECT h, count(*) AS c FROM fps GROUP BY h),
       |fpk AS (SELECT doc_id, h FROM fps JOIN dfc USING (h)
       |        WHERE c <= ${TextOps.WinnowMaxDf}),
       |sz AS (SELECT doc_id, count(*) AS n FROM fpk GROUP BY doc_id),
       |pr AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_shared
       |  FROM fpk x JOIN fpk y ON x.h = y.h AND x.doc_id < y.doc_id
       |  GROUP BY x.doc_id, y.doc_id
       |  HAVING count(*) >= ${TextOps.WinnowMinShared})
       |SELECT pr.doc_a, pr.doc_b, CAST(pr.n_shared AS BIGINT) AS n_shared,
       |  CAST(pr.n_shared * 1000 // least(sa.n, sb.n) AS BIGINT) AS overlap_permille
       |FROM pr JOIN sz sa ON sa.doc_id = pr.doc_a
       |        JOIN sz sb ON sb.doc_id = pr.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Cross-host mirror-detection mirror (TextOps.mirrorHosts over the
    * planted mirror corpus): distinct (host, sha256) rows, per-sha
    * host-frequency cap BEFORE the pair self-join, shared-page floor,
    * containment permille over the capped per-host page sets. Host
    * derivation = the planted hostId arithmetic (hidOfSql — the same
    * single source SparkEntry's page fragments use); constants from
    * TextOps.
    */
  val mirrorHosts: String = {
    val hostOf = s"'host' || CAST(${hidOfSql("doc_id")} AS VARCHAR) || '.example'"
    s"""WITH corpus AS (
       |  SELECT * FROM documents
       |  UNION ALL
       |  SELECT doc_id + ${TextOps.MirrorCopyShift} AS doc_id, text, lang, source, n_chars
       |  FROM documents WHERE doc_id % ${TextOps.MirrorEvery} = 0),
       |hs AS (SELECT DISTINCT $hostOf AS host, sha256(text) AS sha FROM corpus),
       |dfc AS (SELECT sha, count(*) AS c FROM hs GROUP BY sha),
       |hk AS (SELECT host, sha FROM hs JOIN dfc USING (sha)
       |       WHERE c <= ${TextOps.MirrorMaxDf}),
       |sz AS (SELECT host, count(*) AS n FROM hk GROUP BY host),
       |pr AS (
       |  SELECT x.host AS host_a, y.host AS host_b, count(*) AS n_shared
       |  FROM hk x JOIN hk y ON x.sha = y.sha AND x.host < y.host
       |  GROUP BY x.host, y.host
       |  HAVING count(*) >= ${TextOps.MirrorMinShared})
       |SELECT pr.host_a, pr.host_b, CAST(pr.n_shared AS BIGINT) AS n_shared,
       |  CAST(pr.n_shared * 1000 // least(sa.n, sb.n) AS BIGINT) AS mirror_permille
       |FROM pr JOIN sz sa ON sa.host = pr.host_a
       |        JOIN sz sb ON sb.host = pr.host_b
       |ORDER BY host_a, host_b""".stripMargin
  }

  /** Mirror-site CLUSTER mirror (Queries.mirrorClustersQ): the FULL
    * mirrorHosts mirror embedded as a derived table (the dup_best
    * embedding style — a cap/floor/shift change hits this row too),
    * host ids parsed back from the pair strings, the recursive-CTE
    * min-label fixpoint over numeric ids (the dup_cluster CC shape)
    * with a fresh copy of the mirror corpus for the node universe,
    * canonical host = component minimum.
    */
  val mirrorClusters: String =
    s"""WITH RECURSIVE mh AS (SELECT * FROM ($mirrorHosts) t),
       |mcorpus AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
       |  UNION ALL
       |  SELECT doc_id + ${TextOps.MirrorCopyShift} AS doc_id
       |  FROM documents WHERE doc_id % ${TextOps.MirrorEvery} = 0),
       |nodes AS (SELECT DISTINCT ${hidOfSql("doc_id")} AS hid FROM mcorpus),
       |e AS (SELECT CAST(regexp_extract(host_a, 'host(\\d+)', 1) AS BIGINT) AS a,
       |             CAST(regexp_extract(host_b, 'host(\\d+)', 1) AS BIGINT) AS b FROM mh),
       |sym AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b AS src, a AS dst FROM e),
       |cc AS (
       |  SELECT hid AS node, hid AS label FROM nodes
       |  UNION
       |  SELECT s.dst AS node, cc.label FROM cc JOIN sym s ON s.src = cc.node),
       |lab AS (SELECT node, min(label) AS label FROM cc GROUP BY node)
       |SELECT 'host' || CAST(node AS VARCHAR) || '.example' AS host,
       |  'host' || CAST(label AS VARCHAR) || '.example' AS canonical_host,
       |  CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS cluster_size,
       |  node = label AS is_canonical
       |FROM lab ORDER BY host""".stripMargin

  /** MinHash+LSH near-dup edge chain over a CTE named `corpus`
    * (doc_id, text): 3-word shingles → FNV-1a/seed-xor/splitmix64
    * signatures → 4-row band slices → bucket pairs → exact-Jaccard
    * verify, ending in `jac(doc_a, doc_b, jaccard_milli)` — the
    * TextOps.dedupMinhashEdges mirror, factored so both the standalone
    * dedup_minhash oracle and the curate_funnel oracle (which gates
    * the corpus first) replay the SAME kernel SQL.
    */
  private val minhashEdgeCtes: String =
    minhashEdgeCtesWith("x.doc_id < y.doc_id")

  /** The near-dup-augmented corpus CTE and the capped band/verify
    * chain, exposed for compositions assembled OUTSIDE this object
    * (hard_negatives embeds both into the bm25 template): same
    * strings the dedup_minhash / neardup_search rows ride, so a
    * band-geometry or corpus-rule change hits those rows too.
    */
  private[graft] def nearDupCorpusCte: String = nearDupCorpus
  private[graft] def cappedNeardupChain(pairCond: String): String =
    minhashEdgeCtesWith(pairCond, capped = true)

  /** [[minhashEdgeCtes]] with the candidate-pair predicate
    * parameterized (x = left/query side): the default `x.doc_id <
    * y.doc_id` branch is byte-identical to the historical string;
    * neardup_search re-keys it to a query slice. With `capped`, the
    * slices CTE carries a per-(band, bucket) count so the pair
    * predicate can mirror TextOps.MinhashMaxBucket (x and y share the
    * bucket, so one `y.cnt <=` term equals Spark's bucket drop); the
    * curate-funnel mirrors stay on the uncapped branch — their planted
    * corpus has no hot buckets by construction, and the recursive
    * funnel scope is plan-shape-fragile (see curateFunnel's measured
    * constraints) so no window is added inside it.
    */
  private def minhashEdgeCtesWith(pairCond: String,
                                  capped: Boolean = false): String = {
    val seedVals = TextOps.minhashSeeds.zipWithIndex.map { case (s, k) =>
      s"($k, ${java.lang.Long.toUnsignedString(s)}::HUGEINT)"
    }.mkString(", ")
    s"""shd AS (
       |  SELECT DISTINCT doc_id, u.sh
       |  FROM corpus, UNNEST(${shinglesSql("text")}) AS u(sh)),
       |fvs AS (SELECT sh, ${fnvU("sh")} AS h FROM (SELECT DISTINCT sh FROM shd) dsh),
       |seeds(k, seed) AS (VALUES $seedVals),
       |sx AS (SELECT sh, k, ${xor64("fvs.h", "seeds.seed")} AS x FROM fvs, seeds),
       |${splitmixCtes("p", "sx", "sh, k")},
       |sig AS (
       |  SELECT shd.doc_id, p6.k, min(p6.hk) AS hk
       |  FROM shd JOIN p6 USING (sh) GROUP BY shd.doc_id, p6.k),
       |slices AS (
       |  SELECT doc_id, CAST(k // 4 AS INTEGER) AS band, list(hk ORDER BY k) AS bucket
       |  FROM sig GROUP BY doc_id, k // 4),${
         if (capped)
           "\n|slc AS (SELECT s.*, count(*) OVER (PARTITION BY band, bucket) AS cnt FROM slices s),"
         else ""}
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM ${if (capped) "slc" else "slices"} x JOIN ${if (capped) "slc" else "slices"} y
       |    ON x.band = y.band AND x.bucket = y.bucket AND $pairCond),
       |sets AS (SELECT doc_id, list(sh) AS ss FROM shd GROUP BY doc_id),
       |jac AS (
       |  SELECT p.doc_a, p.doc_b,
       |    CAST(floor(CAST(len(list_intersect(a.ss, b.ss)) AS DOUBLE)
       |      / CAST(len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss)) AS DOUBLE) * 1000) AS BIGINT) AS jaccard_milli
       |  FROM pairs p JOIN sets a ON a.doc_id = p.doc_a JOIN sets b ON b.doc_id = p.doc_b)""".stripMargin
  }

  val dedupMinhash: String =
    s"""WITH $nearDupCorpus,
       |${minhashEdgeCtesWith(
           s"x.doc_id < y.doc_id AND y.cnt <= ${TextOps.MinhashMaxBucket}",
           capped = true)}
       |SELECT doc_a, doc_b, jaccard_milli FROM jac WHERE jaccard_milli >= 700
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Near-dup SEARCH mirror (TextOps.neardupSearch recomputed): the
    * same band/verify chain with the pair predicate re-keyed to the
    * query slice (doc_id % 50 = 0, self excluded) and the corpus-side
    * hot-bucket cap mirrored — "find my near-duplicates" answered for
    * a bounded request batch.
    */
  val neardupSearch: String =
    s"""WITH $nearDupCorpus,
       |${minhashEdgeCtesWith(
           "x.doc_id % 50 = 0 AND x.doc_id <> y.doc_id AND y.cnt <= " +
             TextOps.MinhashMaxBucket,
           capped = true)}
       |SELECT doc_a AS query_id, doc_b AS doc_id, jaccard_milli
       |FROM jac WHERE jaccard_milli >= 700
       |ORDER BY query_id, doc_id""".stripMargin

  /** Fuzzy-decontamination mirror (Queries.decontaminateFuzzyQ): the
    * decontaminate planted corpus (documents ∪ eval copies at
    * +4000001, doc_id % 50 = 0 — ANOTHER consumer of that eval-slice
    * rule next to the four r5j rows) through the capped minhashEdge
    * chain, pair predicate re-keyed to eval-as-query (x = eval slice,
    * y's bucket cap mirrors the Spark corpus-side hot-bucket drop;
    * the eval copies are band-identical to their members of the
    * corpus, so slice counts match Spark's corpusBands exactly),
    * train-side hits only.
    */
  val decontaminateFuzzy: String =
    s"""WITH corpus AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 4000001 AS doc_id, text FROM documents WHERE doc_id % 50 = 0),
       |${minhashEdgeCtesWith(
           "x.doc_id >= 4000001 AND x.doc_id <> y.doc_id AND y.cnt <= " +
             TextOps.MinhashMaxBucket,
           capped = true)}
       |SELECT doc_a AS eval_id, doc_b AS doc_id, jaccard_milli
       |FROM jac WHERE jaccard_milli >= 700 AND doc_b < 4000001
       |ORDER BY eval_id, doc_id""".stripMargin

  val ngramJaccard: String =
    s"""WITH pairs AS (
       |  SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b, text AS text_a,
       |         substring(text, 1, length(text) - instr(reverse(text), ' ')) AS text_b
       |  FROM documents WHERE doc_id % 10 = 0),
       |shp AS (
       |  SELECT doc_a, doc_b,
       |    list_distinct(${shinglesSql("text_a")}) AS sa,
       |    list_distinct(${shinglesSql("text_b")}) AS sb
       |  FROM pairs)
       |SELECT doc_a, doc_b,
       |  CAST(floor(CAST(len(list_intersect(sa, sb)) AS DOUBLE)
       |    / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE) * 1000) AS BIGINT) AS jaccard_milli
       |FROM shp ORDER BY doc_a""".stripMargin

  /** Stubbed feature-extraction mirror: per (doc, slot) splitmix64 of
    * (FNV-1a(payload) xor slot), unsigned mod 1000 — same layered
    * HUGEINT chain as the minhash oracle.
    */
  val mmEmbed: String =
    s"""WITH fv AS (SELECT doc_id, ${fnvU("text")} AS h FROM documents),
       |sj AS (SELECT doc_id, jj.j, ${xor64("fv.h", "CAST(jj.j AS HUGEINT)")} AS x
       |       FROM fv, UNNEST(range(4)) AS jj(j)),
       |${splitmixCtes("q", "sj", "doc_id, j")}
       |SELECT doc_id,
       |  CAST(max(CASE WHEN j = 0 THEN hk % 1000 END) AS BIGINT) AS f0,
       |  CAST(max(CASE WHEN j = 1 THEN hk % 1000 END) AS BIGINT) AS f1,
       |  CAST(max(CASE WHEN j = 2 THEN hk % 1000 END) AS BIGINT) AS f2,
       |  CAST(max(CASE WHEN j = 3 THEN hk % 1000 END) AS BIGINT) AS f3
       |FROM q6 GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Exact-cosine mirror, parameterized on the query-set predicate and
    * k (hybrid_rrf's vector leg keys its queries off the shared
    * id % 101 slice at depth 10; the default ann_cosine row keeps the
    * vec_id-prefix convention at 5).
    */
  def annCosineWith(queryPred: String, k: Int): String =
    s"""WITH normed AS (
       |  SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm FROM normed WHERE $queryPred),
       |scored AS (
       |  SELECT q.query_id, n.vec_id AS neighbor_id,
       |         ${dotSql("q.q_emb", "n.embedding")} / (n.norm * q.q_norm) AS sim
       |  FROM normed n, q WHERE n.vec_id <> q.query_id),
       |r AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank,
       |         CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_micro
       |  FROM scored)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim_micro
       |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  val annCosine: String = annCosineWith("vec_id < 10", 5)

  /** Multi-table multi-probe sign-LSH mirror: 16 tables × 9 planes,
    * each query probes its own bucket plus the 9 Hamming-1 buckets per
    * table (xor masks 0,1,2,…,256); candidates are the DISTINCT
    * (query, neighbor) id pairs over all tables, scored once.
    */
  /** Multi-probe LSH mirror parameterized on the query-set predicate
    * (over `b.vec_id`) and k — hybrid_serve's vector leg re-keys it to
    * the shared id % 101 slice at depth 10; the default rows keep the
    * vec_id-prefix convention at 5.
    */
  def annLshWith(queryPred: String, k: Int): String =
    annLshTemplate(queryPred, None, k)

  /** The one LSH-mirror template: optional BASE-side predicate (over
    * `n.vec_id`) gates candidates before scoring — None generates the
    * byte-identical string annLshWith always produced (the six
    * LSH-geometry oracle rows must not move when this is touched).
    */
  private def annLshTemplate(queryPred: String, basePred: Option[String],
                             k: Int): String = {
    val masks = (0 +: (0 until 9).map(1 << _)).mkString(", ")
    val baseFilter = basePred.map(p => s" AND $p").getOrElse("")
    s"""WITH ${bandedCte(VectorOps.hyperplanes(16 * 9, 64), 9)},
       |normed AS (
       |  SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings),
       |qp AS (
       |  SELECT b.vec_id AS query_id, b.band, xor(b.bucket, CAST(m.mask AS BIGINT)) AS bucket
       |  FROM banded b, UNNEST([$masks]) AS m(mask)
       |  WHERE $queryPred),
       |cand AS (
       |  SELECT DISTINCT q.query_id, n.vec_id AS neighbor_id
       |  FROM banded n JOIN qp q ON n.band = q.band AND n.bucket = q.bucket
       |  WHERE n.vec_id <> q.query_id$baseFilter),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         ${dotSql("q.embedding", "n.embedding")} / (n.norm * q.norm) AS sim
       |  FROM cand c JOIN normed n ON n.vec_id = c.neighbor_id
       |              JOIN normed q ON q.vec_id = c.query_id),
       |r AS (SELECT query_id, neighbor_id,
       |        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank,
       |        CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_micro
       |      FROM scored)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim_micro
       |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  val annLsh: String = annLshWith("b.vec_id < 10", 5)

  /** Filtered-ANN mirror (VectorOps.annLshFiltered): same LSH chain
    * with the base side gated to the allowed set vec_id % 3 = 0 before
    * scoring — ranks are within the allowed subset.
    */
  /** Deletion-serving mirror (AnnIndex.delete + serveLsh): the same
    * LSH chain with victims vec_id % 5 = 0 removed from the INDEXED
    * (candidate) side only — queries still come from the full base.
    * Generated from the SAME annLshTemplate as ann_lsh / ann_lsh_serve
    * / ann_lsh_filtered, so an LSH geometry change hits this row too.
    */
  val annLshDelete: String =
    annLshTemplate("b.vec_id < 10", Some("n.vec_id % 5 <> 0"), 5)

  val annLshFiltered: String =
    annLshTemplate("b.vec_id < 10", Some("n.vec_id % 3 = 0"), 5)

  /** IVF oracle: the deterministic integer k-means of VectorOps
    * .kmeansMilli UNROLLED (fixed iteration count, no RNG) — all
    * arithmetic is exact (milli integers; JVM truncating `/` == DuckDB
    * integer `//`, both toward zero — floorDiv would NOT match), so
    * the SQL recomputes identical centroids, identical cell
    * assignments, identical probes, and the same cosine top-k.
    */
  /** Shared k-means CTE chain (VectorOps.kmeansMilli unrolled): ends in
    * `af(vec_id, cid, d)` (distances to final centroids) and
    * `assigned(vec_id, cid)` — used by both annIvf and embedCluster.
    */
  /** @param src source relation of (vec_id, embedding FLOAT[]) —
    *   default "embeddings" generates the byte-identical string the
    *   two-arg form always produced (the ivf/pq/recall/serve oracle
    *   rows must not move when this is touched); semDedup passes its
    *   planted-corpus CTE name.
    */
  private def kmeansAssignCtes(k: Int, iters: Int,
                               src: String = "embeddings"): String = {
    val iterCtes = (1 to iters).map { n =>
      val prev = s"c${n - 1}"
      s"""a$n AS (
         |  SELECT v.vec_id, c.cid, sum((v.m - c.m) * (v.m - c.m)) AS d
         |  FROM vm v JOIN $prev c USING (i) GROUP BY v.vec_id, c.cid),
         |b$n AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
         |    FROM a$n) t WHERE rn = 1),
         |s$n AS (
         |  SELECT b.cid, v.i, sum(v.m) AS sm, count(*) AS cnt
         |  FROM vm v JOIN b$n b USING (vec_id) GROUP BY b.cid, v.i),
         |c$n AS (
         |  SELECT p.cid, p.i, COALESCE(s$n.sm // s$n.cnt, p.m) AS m
         |  FROM $prev p LEFT JOIN s$n ON s$n.cid = p.cid AND s$n.i = p.i)""".stripMargin
    }.mkString(",\n")
    s"""vm AS (
       |  SELECT vec_id, dd.i,
       |         CAST(floor(CAST(embedding[CAST(dd.i AS INTEGER)+1] AS DOUBLE) * 1000.0) AS BIGINT) AS m
       |  FROM $src, UNNEST(range(len(embedding))) AS dd(i)),
       |c0 AS (
       |  -- cid = POSITION among the init vectors (dense_rank), not the
       |  -- raw vec_id: Spark's kmeansMilli indexes its centroid array
       |  -- by sorted position, and the two only coincide when init ids
       |  -- are contiguous from 0 — a filtered table would diverge
       |  SELECT CAST(dense_rank() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, i, m
       |  FROM vm WHERE vec_id < $k),
       |$iterCtes,
       |af AS (
       |  SELECT v.vec_id, c.cid, sum((v.m - c.m) * (v.m - c.m)) AS d
       |  FROM vm v JOIN c$iters c USING (i) GROUP BY v.vec_id, c.cid),
       |assigned AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM af) t WHERE rn = 1)""".stripMargin
  }

  val annIvf: String = {
    val (k, iters, nProbe, nQueries, topK) = (16, 3, 2, 10, 5)
    s"""WITH ${kmeansAssignCtes(k, iters)},
       |probes AS (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM af WHERE vec_id < $nQueries) t WHERE rn <= $nProbe),
       |normed AS (
       |  SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings),
       |scored AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |         ${dotSql("q.embedding", "n.embedding")} / (n.norm * q.norm) AS sim
       |  FROM probes p
       |  JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.query_id
       |  JOIN normed n ON n.vec_id = a.vec_id
       |  JOIN normed q ON q.vec_id = p.query_id),
       |r AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank,
       |         CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_micro
       |  FROM scored)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim_micro
       |FROM r WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin
  }

  /** Cluster census mirror: the k-means assignment chain + label join,
    * majority label with (count desc, label asc) ties, integer purity.
    */
  val embedCluster: String =
    s"""WITH ${kmeansAssignCtes(16, 3)},
       |lab AS (
       |  SELECT a.vec_id, a.cid AS cell, CAST(e.label AS BIGINT) AS label
       |  FROM assigned a JOIN embeddings e USING (vec_id)),
       |pl AS (SELECT cell, label, count(*) AS n FROM lab GROUP BY cell, label),
       |tot AS (SELECT cell, sum(n) AS n_vecs FROM pl GROUP BY cell),
       |r AS (
       |  SELECT cell, label, n,
       |         row_number() OVER (PARTITION BY cell ORDER BY n DESC, label ASC) AS rn
       |  FROM pl)
       |SELECT CAST(r.cell AS BIGINT) AS cell, CAST(t.n_vecs AS BIGINT) AS n_vecs,
       |  r.label AS top_label, CAST(r.n * 1000 // t.n_vecs AS BIGINT) AS purity_permille
       |FROM r JOIN tot t USING (cell) WHERE r.rn = 1 ORDER BY cell""".stripMargin

  /** Cluster-balanced sampling mirror (VectorOps.clusterSample
    * recomputed): the k-means assignment chain + per-cell census and
    * truncating-division rates + the splitmix64 admission kernel (the
    * strat_sample chain, keyed (vec_id, cid)) re-aggregated per cell.
    */
  val clusterSample: String = {
    val (k, iters, budget) = (16, 3, 24L)
    val seedU = java.lang.Long.toUnsignedString(VectorOps.ClusterSampleSeed)
    s"""WITH ${kmeansAssignCtes(k, iters)},
       |cen AS (SELECT cid, count(*) AS n_vecs FROM assigned GROUP BY cid),
       |rates AS (SELECT cid, n_vecs,
       |            least(1000, ${budget * 1000} // n_vecs) AS rate_permille
       |          FROM cen),
       |s0 AS (SELECT a.vec_id, a.cid,
       |         ${xor64("CAST(a.vec_id AS HUGEINT)", s"$seedU::HUGEINT")} AS x
       |       FROM assigned a),
       |${splitmixCtes("cb", "s0", "vec_id, cid")},
       |adm AS (
       |  SELECT r.cid, r.n_vecs, r.rate_permille,
       |         sum(CASE WHEN m.hk % 1000 < r.rate_permille THEN 1 ELSE 0 END) AS n_sampled
       |  FROM rates r JOIN cb6 m USING (cid)
       |  GROUP BY r.cid, r.n_vecs, r.rate_permille)
       |SELECT CAST(cid AS BIGINT) AS cell, CAST(n_vecs AS BIGINT) AS n_vecs,
       |  CAST(rate_permille AS BIGINT) AS rate_permille,
       |  CAST(n_sampled AS BIGINT) AS n_sampled
       |FROM adm ORDER BY cell""".stripMargin
  }

  /** PQ oracle: per-subspace integer k-means (VectorOps.pqTrain)
    * unrolled with (subspace, cell) keys — same exact-arithmetic
    * discipline as the IVF mirror (milli integers, truncating `//`,
    * fixed iterations, ties to the smaller cell id) — then codes, the
    * per-query exact distance table, the ADC shortlist, and the exact
    * cosine re-rank.
    */
  /** PQ training + code CTE chain (the annPq body up through `codes`),
    * factored so the composed IVF+PQ mirror reuses it VERBATIM: assumes
    * `vm` (the milli view) is already defined; ends in `paf` (every
    * vector's exact per-subspace distances to the final codebooks —
    * query ADC tables read straight off it) and `codes` (the argmin
    * sub-codes).
    */
  private def pqChainCtes(kCode: Int, iters: Int, sub: Int): String = {
    val iterCtes = (1 to iters).map { n =>
      val prev = s"pc${n - 1}"
      s"""pa$n AS (
         |  SELECT v.vec_id, c.s, c.cid, sum((v.m - c.m) * (v.m - c.m)) AS d
         |  FROM vm v JOIN $prev c ON v.i = c.i
         |  GROUP BY v.vec_id, c.s, c.cid),
         |pb$n AS (
         |  SELECT vec_id, s, cid FROM (
         |    SELECT vec_id, s, cid,
         |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, cid ASC) AS rn
         |    FROM pa$n) t WHERE rn = 1),
         |ps$n AS (
         |  SELECT b.s, b.cid, v.i, sum(v.m) AS sm, count(*) AS cnt
         |  FROM vm v JOIN pb$n b ON b.vec_id = v.vec_id AND b.s = v.i // $sub
         |  GROUP BY b.s, b.cid, v.i),
         |pc$n AS (
         |  SELECT p.s, p.cid, p.i, COALESCE(ps$n.sm // ps$n.cnt, p.m) AS m
         |  FROM $prev p LEFT JOIN ps$n ON ps$n.s = p.s AND ps$n.cid = p.cid AND ps$n.i = p.i)""".stripMargin
    }.mkString(",\n")
    s"""pc0 AS (
       |  -- cid = sorted POSITION among init vectors (see kmeansAssignCtes)
       |  SELECT i // $sub AS s,
       |         CAST(dense_rank() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, i, m
       |  FROM vm WHERE vec_id < $kCode),
       |$iterCtes,
       |paf AS (
       |  SELECT v.vec_id, c.s, c.cid, sum((v.m - c.m) * (v.m - c.m)) AS d
       |  FROM vm v JOIN pc$iters c ON v.i = c.i
       |  GROUP BY v.vec_id, c.s, c.cid),
       |codes AS (
       |  SELECT vec_id, s, cid FROM (
       |    SELECT vec_id, s, cid,
       |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, cid ASC) AS rn
       |    FROM paf) t WHERE rn = 1)""".stripMargin
  }

  val annPq: String = {
    val (kCode, iters, nQueries, topK, shortlist, sub) = (64, 3, 10, 5, 100, 8)
    s"""WITH vm AS (
       |  SELECT vec_id, dd.i,
       |         CAST(floor(CAST(embedding[CAST(dd.i AS INTEGER)+1] AS DOUBLE) * 1000.0) AS BIGINT) AS m
       |  FROM embeddings, UNNEST(range(len(embedding))) AS dd(i)),
       |${pqChainCtes(kCode, iters, sub)},
       |qd AS (SELECT vec_id AS query_id, s, cid, d FROM paf WHERE vec_id < $nQueries),
       |adc AS (
       |  SELECT q.query_id, a.vec_id, sum(q.d) AS adc_dist
       |  FROM codes a JOIN qd q ON q.s = a.s AND q.cid = a.cid
       |  WHERE a.vec_id <> q.query_id
       |  GROUP BY q.query_id, a.vec_id),
       |short AS (
       |  SELECT query_id, vec_id AS neighbor_id FROM (
       |    SELECT query_id, vec_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY adc_dist ASC, vec_id ASC) AS rn
       |    FROM adc) t WHERE rn <= $shortlist),
       |normed AS (
       |  SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings),
       |scored AS (
       |  SELECT sh.query_id, sh.neighbor_id,
       |         ${dotSql("q.embedding", "n.embedding")} / (n.norm * q.norm) AS sim
       |  FROM short sh JOIN normed n ON n.vec_id = sh.neighbor_id
       |                JOIN normed q ON q.vec_id = sh.query_id),
       |r AS (SELECT query_id, neighbor_id,
       |        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank,
       |        CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_micro
       |      FROM scored)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim_micro
       |FROM r WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin
  }

  /** IVF+PQ mirror (VectorOps.annIvfPq recomputed): a pure composition
    * of the two existing chains — kmeansAssignCtes (coarse cells +
    * every vector's probe distances) and pqChainCtes (codebooks +
    * codes) share the `vm` milli view; candidates are the probed-cell
    * members, ADC sums the query's paf rows over each candidate's
    * codes, then the SAME shortlist + exact-cosine re-rank tail as
    * annPq. Changing ANY IVF or PQ default therefore changes this row
    * too (and the serve row that reuses it).
    */
  val annIvfPq: String = {
    val (k, iters, nProbe, kCode, nQueries, topK, shortlist, sub) =
      (16, 3, 2, 64, 10, 5, 100, 8)
    s"""WITH ${kmeansAssignCtes(k, iters)},
       |${pqChainCtes(kCode, iters, sub)},
       |probes AS (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM af WHERE vec_id < $nQueries) t WHERE rn <= $nProbe),
       |cand AS (
       |  SELECT p.query_id, a.vec_id
       |  FROM probes p JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.query_id),
       |qd AS (SELECT vec_id AS query_id, s, cid, d FROM paf WHERE vec_id < $nQueries),
       |adc AS (
       |  SELECT cd.query_id, cd.vec_id, sum(q.d) AS adc_dist
       |  FROM cand cd
       |  JOIN codes a ON a.vec_id = cd.vec_id
       |  JOIN qd q ON q.query_id = cd.query_id AND q.s = a.s AND q.cid = a.cid
       |  GROUP BY cd.query_id, cd.vec_id),
       |short AS (
       |  SELECT query_id, vec_id AS neighbor_id FROM (
       |    SELECT query_id, vec_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY adc_dist ASC, vec_id ASC) AS rn
       |    FROM adc) t WHERE rn <= $shortlist),
       |normed AS (
       |  SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings),
       |scored AS (
       |  SELECT sh.query_id, sh.neighbor_id,
       |         ${dotSql("q.embedding", "n.embedding")} / (n.norm * q.norm) AS sim
       |  FROM short sh JOIN normed n ON n.vec_id = sh.neighbor_id
       |                JOIN normed q ON q.vec_id = sh.query_id),
       |r AS (SELECT query_id, neighbor_id,
       |        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank,
       |        CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_micro
       |      FROM scored)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim_micro
       |FROM r WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin
  }

  /** SQ8 mirror (VectorOps.sqTrain/sqEncode/annSqFromQ recomputed):
    * per-dimension integer min/max over the milli values, code =
    * clamp_255((m - mn) * 255 // rng) — numerator non-negative on the
    * training corpus, so DuckDB's toward-zero `//` equals the JVM `/`
    * — and ADC = squared L2 in the 255-scaled milli space between the
    * query and the dequantization mn*255 + c*rng, shortlist by
    * (d ASC, vec_id ASC), then the SAME exact cosine re-rank tail as
    * annPq.
    */
  val annSq: String = {
    val (nQueries, topK, shortlist) = (10, 5, 100)
    s"""WITH vm AS (
       |  SELECT vec_id, dd.i,
       |         CAST(floor(CAST(embedding[CAST(dd.i AS INTEGER)+1] AS DOUBLE) * 1000.0) AS BIGINT) AS m
       |  FROM embeddings, UNNEST(range(len(embedding))) AS dd(i)),
       |mm AS (SELECT i, min(m) AS mn, greatest(1, max(m) - min(m)) AS rng
       |       FROM vm GROUP BY i),
       |codes AS (
       |  SELECT v.vec_id, v.i,
       |         least(255, greatest(0, ((v.m - mm.mn) * 255) // mm.rng)) AS c
       |  FROM vm v JOIN mm USING (i)),
       |qs AS (SELECT vec_id AS query_id, i, m * 255 AS qsc
       |       FROM vm WHERE vec_id < $nQueries),
       |adc AS (
       |  SELECT q.query_id, c.vec_id,
       |         sum((q.qsc - (mm.mn * 255 + c.c * mm.rng)) *
       |             (q.qsc - (mm.mn * 255 + c.c * mm.rng))) AS d
       |  FROM codes c JOIN mm ON mm.i = c.i JOIN qs q ON q.i = c.i
       |  WHERE c.vec_id <> q.query_id
       |  GROUP BY q.query_id, c.vec_id),
       |short AS (
       |  SELECT query_id, vec_id AS neighbor_id FROM (
       |    SELECT query_id, vec_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY d ASC, vec_id ASC) AS rn
       |    FROM adc) t WHERE rn <= $shortlist),
       |normed AS (
       |  SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings),
       |scored AS (
       |  SELECT sh.query_id, sh.neighbor_id,
       |         ${dotSql("q.embedding", "n.embedding")} / (n.norm * q.norm) AS sim
       |  FROM short sh JOIN normed n ON n.vec_id = sh.neighbor_id
       |                JOIN normed q ON q.vec_id = sh.query_id),
       |r AS (SELECT query_id, neighbor_id,
       |        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank,
       |        CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_micro
       |      FROM scored)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim_micro
       |FROM r WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin
  }

  /** Recall@5 of the approximate ANN methods vs the exact brute-force
    * top-k — a pure composition of the already-mirrored queries, so the
    * oracle re-derives the recall numbers from first principles.
    */
  val annRecall: String =
    s"""WITH exact AS (SELECT query_id, neighbor_id FROM ($annCosine) e),
       |lsh AS (SELECT query_id, neighbor_id FROM ($annLsh) l),
       |ivf AS (SELECT query_id, neighbor_id FROM ($annIvf) i),
       |pq AS (SELECT query_id, neighbor_id FROM ($annPq) p),
       |h AS (
       |  SELECT 'ivf' AS method,
       |         (SELECT count(*) FROM ivf JOIN exact USING (query_id, neighbor_id)) AS n_hits
       |  UNION ALL
       |  SELECT 'lsh' AS method,
       |         (SELECT count(*) FROM lsh JOIN exact USING (query_id, neighbor_id)) AS n_hits
       |  UNION ALL
       |  SELECT 'pq' AS method,
       |         (SELECT count(*) FROM pq JOIN exact USING (query_id, neighbor_id)) AS n_hits)
       |SELECT method, CAST(n_hits AS BIGINT) AS n_hits,
       |  CAST(50 AS BIGINT) AS n_total,
       |  CAST(n_hits * 1000 // 50 AS BIGINT) AS recall_milli
       |FROM h ORDER BY method""".stripMargin

  val dedupEmbedding: String =
    s"""WITH ${bucketsCte(VectorOps.hyperplanes(32, 64))},
       |banded AS (
       |  SELECT vec_id, bb.band, (bucketbits >> (CAST(bb.band AS INTEGER)*8)) & 255 AS bucket
       |  FROM buckets, UNNEST(range(4)) AS bb(band)),
       |bcnt AS (SELECT band, bucket, count(*) AS cnt FROM banded GROUP BY band, bucket),
       |bounded AS (
       |  -- the Spark side's hot-bucket cap, mirrored: buckets outside
       |  -- [2, maxBucket] never produce candidates
       |  SELECT b.vec_id, b.band, b.bucket
       |  FROM banded b JOIN bcnt USING (band, bucket)
       |  WHERE cnt >= 2 AND cnt <= $DedupEmbeddingMaxBucket),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM bounded x JOIN bounded y ON x.band = y.band AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
       |normed AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS norm FROM embeddings),
       |simd AS (
       |  SELECT p.vec_a, p.vec_b,
       |    CAST(floor(${dotSql("a.embedding", "b.embedding")} / (a.norm * b.norm) * 1000000.0) AS BIGINT) AS sim_micro
       |  FROM cand p JOIN normed a ON a.vec_id = p.vec_a JOIN normed b ON b.vec_id = p.vec_b)
       |SELECT vec_a, vec_b, sim_micro FROM simd WHERE sim_micro >= $DedupEmbeddingMinSimMicro
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Duplicate clustering: recursive min-label propagation over the
    * union of exact-dup pairs (identical-text groups star-linked to
    * their min) and the MinHash-LSH near-dup pairs — the recursive CTE
    * is the fixpoint the Spark-side iterative propagation converges to.
    * Corpus: base ∪ near-dups (+1e6) ∪ exact copies of every 20th doc
    * of both (+2e6), yielding genuine 4-node transitive chains.
    */
  val dupCluster: String =
    s"""WITH RECURSIVE corpus0 AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |         substring(text, 1, length(text) - instr(reverse(text), ' ')) AS text
       |  FROM documents WHERE doc_id % 10 = 0),
       |corpusx AS (
       |  SELECT doc_id, text FROM corpus0
       |  UNION ALL
       |  SELECT doc_id + 2000000 AS doc_id, text FROM corpus0 WHERE doc_id % 20 = 0),
       |exact_edges AS (
       |  SELECT min_id AS doc_a, doc_id AS doc_b FROM (
       |    SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS min_id FROM corpusx) t
       |  WHERE doc_id <> min_id),
       |near_edges AS (SELECT doc_a, doc_b FROM ($dedupMinhash) mh),
       |edges AS (SELECT doc_a, doc_b FROM near_edges
       |          UNION ALL SELECT doc_a, doc_b FROM exact_edges),
       |sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
       |        UNION ALL SELECT doc_b AS src, doc_a AS dst FROM edges),
       |cc AS (
       |  SELECT doc_id AS node, doc_id AS label FROM corpusx
       |  UNION
       |  SELECT s.dst AS node, cc.label FROM cc JOIN sym s ON s.src = cc.node),
       |lab AS (SELECT node AS doc_id, min(label) AS cluster_id FROM cc GROUP BY node)
       |SELECT doc_id, cluster_id,
       |  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       |  doc_id = cluster_id AS keep
       |FROM lab ORDER BY doc_id""".stripMargin

  /** Component-size histogram over the dup_cluster relation — the
    * full clustering mirror wrapped as a derived table (DuckDB allows
    * WITH RECURSIVE inside a subquery), so the histogram inherits the
    * clustering's exactness for free.
    */
  val dupStats: String =
    s"""SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs
       |FROM (SELECT DISTINCT cluster_id, cluster_size FROM ($dupCluster) t) c
       |GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  /** Per-host duplication mirror: the full dup_cluster mirror as a
    * derived table, restricted to BASE docs (< 1e6 — the mutant ids
    * carry no host), host via the hid arithmetic, dup = member of a
    * multi-doc cluster.
    */
  val hostDupCensus: String =
    s"""SELECT host_id, n_docs, n_duped,
       |  CAST(n_duped * 1000 // n_docs AS BIGINT) AS dup_permille
       |FROM (
       |  SELECT host_id, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_duped
       |  FROM (SELECT ${hidOfSql("doc_id")} AS host_id, cluster_size
       |        FROM ($dupCluster) t WHERE doc_id < 1000000) h
       |  GROUP BY host_id) g
       |ORDER BY host_id""".stripMargin

  /** Repeat-aware downweighting mirror: the full dup_cluster mirror
    * as a derived table, weight_micro = 10^6 truncating-divided by
    * the cluster size (positive sizes — truncation equals floor on
    * both engines).
    */
  val dupWeights: String =
    s"""SELECT doc_id, cluster_id, cluster_size,
       |  CAST(1000000 // cluster_size AS BIGINT) AS weight_micro
       |FROM ($dupCluster) t ORDER BY doc_id""".stripMargin

  /** Quality-aware canonical mirror (TextOps.dupBestFrom recomputed):
    * the full dup_cluster mirror as a derived table, joined to a
    * fresh copy of its corpus construction (c0/cx — the same
    * documents ∪ truncated(+1e6) ∪ exact(+2e6) rule) for char
    * lengths; the per-cluster winner is row_number over
    * (n_chars DESC, doc_id ASC).
    */
  val dupBest: String =
    s"""WITH c0 AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |         substring(text, 1, length(text) - instr(reverse(text), ' ')) AS text
       |  FROM documents WHERE doc_id % 10 = 0),
       |cx AS (
       |  SELECT doc_id, text FROM c0
       |  UNION ALL
       |  SELECT doc_id + 2000000 AS doc_id, text FROM c0 WHERE doc_id % 20 = 0),
       |cl AS (SELECT doc_id, cluster_id FROM ($dupCluster) t),
       |j AS (SELECT cl.doc_id, cl.cluster_id,
       |        CAST(length(cx.text) AS BIGINT) AS n_chars
       |      FROM cl JOIN cx USING (doc_id)),
       |r AS (SELECT doc_id, cluster_id, n_chars,
       |        row_number() OVER (PARTITION BY cluster_id
       |          ORDER BY n_chars DESC, doc_id ASC) AS rn
       |      FROM j),
       |b AS (SELECT cluster_id, doc_id AS best_doc FROM r WHERE rn = 1)
       |SELECT j.doc_id, j.cluster_id, b.best_doc, j.n_chars,
       |  j.doc_id = b.best_doc AS keep
       |FROM j JOIN b USING (cluster_id) ORDER BY j.doc_id""".stripMargin

  /** Leakage-free split mirror: the full dup_cluster mirror as a
    * derived table, split keyed on the CLUSTER label through the
    * splitmix64 admission chain (TextOps.splitFrom recomputed —
    * train iff splitmix64(cluster_id xor seed) unsigned mod 1000
    * < 900), then the per-split census.
    */
  val splitLeakfree: String = {
    val seedU = java.lang.Long.toUnsignedString(TextOps.SplitSeed)
    s"""WITH base AS (SELECT doc_id, cluster_id FROM ($dupCluster) t),
       |s0 AS (SELECT doc_id, cluster_id,
       |  ${xor64("CAST(cluster_id AS HUGEINT)", s"$seedU::HUGEINT")} AS x
       |  FROM base),
       |${splitmixCtes("sl", "s0", "doc_id, cluster_id")},
       |lab AS (SELECT doc_id, cluster_id,
       |  CASE WHEN hk % 1000 < 900 THEN 'train' ELSE 'holdout' END AS split
       |  FROM sl6)
       |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters
       |FROM lab GROUP BY split ORDER BY split""".stripMargin
  }

  /** Heavy-hitter 8-gram census over the near-dup corpus (ties broken
    * count-desc/gram-asc on both engines).
    */
  /** Count-min-sketch census mirror: per-word buckets from the
    * FNV+splitmix chain under each of the four row seeds (TextOps
    * .CmsSeeds embedded as unsigned literals), cell counts = summed
    * exact counts of the words sharing the cell (equivalent to
    * counting occurrences directly), estimate = min over the four
    * cells — the published CMS read path, integer-exact.
    */
  val cmsCensus: String = {
    import graft.ops.TextOps
    val chains = TextOps.CmsSeeds.zipWithIndex.map { case (s, d) =>
      val su = s"${java.lang.Long.toUnsignedString(s)}::HUGEINT"
      s"""x$d AS (SELECT w, ${xor64("x", su)} AS x FROM f),
         |${splitmixCtes(s"m$d", s"x$d", "w")},
         |b$d AS (SELECT w, $d AS d, CAST(hk % ${TextOps.CmsWidth}::HUGEINT AS BIGINT) AS bucket FROM m${d}6)"""
        .stripMargin
    }.mkString(",\n")
    val union = TextOps.CmsSeeds.indices
      .map(d => s"SELECT * FROM b$d").mkString(" UNION ALL ")
    s"""WITH wx AS (
       |  SELECT u.x AS w
       |  FROM documents, UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS u(x)),
       |cnt AS (SELECT w, count(*) AS exact FROM wx GROUP BY w),
       |f AS (SELECT w, ${fnvU("w")} AS x FROM (SELECT DISTINCT w FROM wx) dw),
       |$chains,
       |wb AS ($union),
       |cms AS (
       |  SELECT d, bucket, CAST(sum(exact) AS BIGINT) AS c
       |  FROM cnt JOIN wb USING (w) GROUP BY d, bucket),
       |est AS (
       |  SELECT wb.w, min(cms.c) AS cms_count
       |  FROM wb JOIN cms USING (d, bucket) GROUP BY wb.w),
       |top AS (SELECT w, exact FROM cnt ORDER BY exact DESC, w ASC LIMIT 10)
       |SELECT t.w, CAST(t.exact AS BIGINT) AS exact_count, e.cms_count,
       |  e.cms_count >= t.exact AS sound
       |FROM top t JOIN est e USING (w)
       |ORDER BY exact_count DESC, w ASC""".stripMargin
  }

  val ngramCensus: String =
    s"""WITH $nearDupCorpus,
       |g AS (
       |  SELECT u.gram
       |  FROM corpus, UNNEST(list_transform(
       |    range(len(string_split(text, ' ')) - 7),
       |    i -> array_to_string(string_split(text, ' ')[i+1:i+8], ' '))) AS u(gram))
       |SELECT gram, count(*) AS n_occurrences FROM g GROUP BY gram
       |HAVING count(*) >= 2
       |ORDER BY n_occurrences DESC, gram ASC LIMIT 20""".stripMargin

  /** Passage-dedup mirror: 16-word non-overlapping windows, FNV-hashed
    * (signed BIGINT view), duplicated = present in >= 2 distinct docs;
    * per-doc stats count every window occurrence. Window list slice is
    * 1-based INCLUSIVE on both ends in DuckDB, matching the Scala
    * slice(i*w, (i+1)*w).
    */
  val passageDedup: String =
    s"""WITH $nearDupCorpus,
       |pw AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM corpus),
       |pass AS (
       |  SELECT doc_id, array_to_string(ws[CAST(u.i*16+1 AS INTEGER):CAST(u.i*16+16 AS INTEGER)], ' ') AS passage
       |  FROM pw, UNNEST(range((len(ws) + 15) // 16)) AS u(i)),
       |fv AS (SELECT passage, ${sb(fnvU("passage"))} AS phash
       |       FROM (SELECT DISTINCT passage FROM pass) dp),
       |ph AS (SELECT p.doc_id, f.phash FROM pass p JOIN fv f USING (passage)),
       |dup AS (
       |  SELECT phash FROM (SELECT DISTINCT doc_id, phash FROM ph) d
       |  GROUP BY phash HAVING count(*) >= 2),
       |agg AS (
       |  SELECT ph.doc_id, count(*) AS n_passages,
       |         sum(CASE WHEN dup.phash IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
       |  FROM ph LEFT JOIN dup USING (phash) GROUP BY ph.doc_id)
       |SELECT doc_id, CAST(n_passages AS BIGINT) AS n_passages,
       |  CAST(n_dup AS BIGINT) AS n_dup_passages,
       |  CAST(n_dup * 1000 // n_passages AS BIGINT) AS dup_permille
       |FROM agg ORDER BY doc_id""".stripMargin

  /** Duplicate-span mirror (TextOps.dedupSpans recomputed): stride-1
    * 16-word windows FNV-hashed (signed BIGINT view), duplicated =
    * verbatim in >= 2 distinct docs after per-doc collapse; spans =
    * gaps-and-islands over duplicated positions (break when the gap
    * exceeds w; island coverage = max-min+w). Window slice is 1-based
    * inclusive in DuckDB, matching Scala slice(i, i+w).
    */
  /** The shared window/island chain of the dedup_spans and dedup_cut
    * mirrors: pw → win → fv → wh → dup → dw2 → isl → isl2 over the
    * near-dup corpus CTE (caller supplies that).
    */
  private def dupSpanChain(w: Int): String =
    s"""pw AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM corpus),
       |win AS (
       |  SELECT doc_id, CAST(u.i AS BIGINT) AS pos, len(ws) AS n_words,
       |    array_to_string(ws[CAST(u.i+1 AS INTEGER):CAST(u.i+$w AS INTEGER)], ' ') AS wstr
       |  FROM pw, UNNEST(range(greatest(len(ws) - ${w - 1}, 0))) AS u(i)),
       |fv AS (SELECT wstr, ${sb(fnvU("wstr"))} AS whash
       |       FROM (SELECT DISTINCT wstr FROM win) dw),
       |wh AS (SELECT n.doc_id, n.pos, n.n_words, f.whash FROM win n JOIN fv f USING (wstr)),
       |dup AS (
       |  SELECT whash FROM (SELECT DISTINCT doc_id, whash FROM wh) d
       |  GROUP BY whash HAVING count(*) >= 2),
       |dw2 AS (SELECT wh.doc_id, wh.pos FROM wh JOIN dup USING (whash)),
       |isl AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > $w
       |         THEN 1 ELSE 0 END AS brk
       |  FROM dw2),
       |isl2 AS (
       |  SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM isl)""".stripMargin

  val dedupSpans: String = {
    val w = 16
    s"""WITH $nearDupCorpus,
       |${dupSpanChain(w)},
       |sp AS (SELECT doc_id, island, max(pos) - min(pos) + $w AS span_tokens
       |       FROM isl2 GROUP BY doc_id, island),
       |per AS (SELECT doc_id, count(*) AS n_spans, sum(span_tokens) AS dup_tokens
       |        FROM sp GROUP BY doc_id),
       |dcnt AS (SELECT doc_id, count(*) AS n_dup_windows FROM dw2 GROUP BY doc_id),
       |base AS (SELECT doc_id, any_value(n_words) AS n_words, count(*) AS n_windows
       |         FROM wh GROUP BY doc_id)
       |SELECT b.doc_id, CAST(b.n_words AS BIGINT) AS n_words,
       |  CAST(b.n_windows AS BIGINT) AS n_windows,
       |  CAST(coalesce(dc.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       |  CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       |  CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |  CAST(coalesce(p.dup_tokens, 0) * 1000 // b.n_words AS BIGINT) AS dup_token_permille
       |FROM base b LEFT JOIN dcnt dc USING (doc_id) LEFT JOIN per p USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Duplicate-span CUT mirror (TextOps.dedupCut recomputed): the same
    * window/island chain, then one coverage row per cut position over
    * the merged [s, e) islands, kept words by position anti-join,
    * clean_text re-joined in position order.
    */
  val dedupCut: String = {
    val w = 16
    s"""WITH $nearDupCorpus,
       |${dupSpanChain(w)},
       |sp2 AS (SELECT doc_id, island, min(pos) AS s, max(pos) + $w AS e
       |        FROM isl2 GROUP BY doc_id, island),
       |cov AS (SELECT doc_id, s + u.i AS p FROM sp2, UNNEST(range(e - s)) AS u(i)),
       |wordsq AS (
       |  SELECT doc_id, CAST(u.i AS BIGINT) AS p, ws[CAST(u.i+1 AS INTEGER)] AS word
       |  FROM pw, UNNEST(range(len(ws))) AS u(i)),
       |keptw AS (
       |  SELECT wq.doc_id, wq.p, wq.word FROM wordsq wq
       |  LEFT JOIN cov c ON wq.doc_id = c.doc_id AND wq.p = c.p
       |  WHERE c.p IS NULL),
       |cl AS (SELECT doc_id, count(*) AS n_kept,
       |              string_agg(word, ' ' ORDER BY p) AS clean_text
       |       FROM keptw GROUP BY doc_id)
       |SELECT b.doc_id, CAST(b.n_words AS BIGINT) AS n_words,
       |  CAST(b.n_words - coalesce(cl.n_kept, 0) AS BIGINT) AS n_cut,
       |  coalesce(cl.clean_text, '') AS clean_text
       |FROM (SELECT doc_id, len(ws) AS n_words FROM pw) b
       |LEFT JOIN cl USING (doc_id) ORDER BY b.doc_id""".stripMargin
  }

  /** Paragraph-dedup mirror (TextOps.lineDedup over corpusWithParas
    * recomputed): the SAME synth — ParaWords-word body chunks wrapped
    * in the doc_id%7 nav header and the universal footer — FNV per
    * distinct paragraph, keeper = first (doc_id, pos) per hash via
    * row_number, clean_text re-joined by chr(10). Slices are 1-based
    * inclusive in DuckDB, matching Scala grouped(ParaWords).
    */
  val lineDedup: String = {
    val w = TextOps.ParaWords
    s"""WITH base AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |  FROM documents),
       |body AS (
       |  SELECT doc_id, CAST(u.i + 1 AS BIGINT) AS pos,
       |    array_to_string(ws[CAST(u.i*$w+1 AS INTEGER):CAST(u.i*$w+$w AS INTEGER)], ' ') AS para
       |  FROM base, UNNEST(range((len(ws) + ${w - 1}) // $w)) AS u(i)),
       |paras AS (
       |  SELECT doc_id, CAST(0 AS BIGINT) AS pos,
       |         '${TextOps.ParaHeaderPrefix}' || CAST(doc_id % 7 AS VARCHAR) AS para
       |  FROM base
       |  UNION ALL SELECT doc_id, pos, para FROM body
       |  UNION ALL SELECT doc_id,
       |         CAST((len(ws) + ${w - 1}) // $w + 1 AS BIGINT) AS pos,
       |         '${TextOps.ParaFooter}' AS para
       |  FROM base),
       |fv AS (SELECT para, ${sb(fnvU("para"))} AS phash
       |       FROM (SELECT DISTINCT para FROM paras) dp),
       |ph AS (SELECT p.doc_id, p.pos, p.para, f.phash
       |       FROM paras p JOIN fv f USING (para)),
       |rn AS (SELECT doc_id, pos, para,
       |         row_number() OVER (PARTITION BY phash ORDER BY doc_id, pos) AS rn
       |       FROM ph),
       |kept AS (SELECT doc_id, count(*) AS n_kept,
       |                string_agg(para, chr(10) ORDER BY pos) AS clean_text
       |         FROM rn WHERE rn = 1 GROUP BY doc_id),
       |tot AS (SELECT doc_id, count(*) AS n_paras FROM paras GROUP BY doc_id)
       |SELECT t.doc_id, CAST(t.n_paras AS BIGINT) AS n_paras,
       |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       |  coalesce(k.clean_text, '') AS clean_text
       |FROM tot t LEFT JOIN kept k USING (doc_id) ORDER BY t.doc_id""".stripMargin
  }

  /** BPE-trainer mirror (ops.Bpe.bpeTrain recomputed): the capped word
    * census, then Bpe.Merges unrolled iterations — adjacent-pair
    * counts weighted by word frequency, winner by (count desc, left,
    * right), greedy application via the run-parity rule (within each
    * run of consecutive match positions — possible only when left ==
    * right — keep even offsets; a kept position merges (i, i+1) and
    * shadows i+1).
    */
  /** The greedy run-parity rewrite of one merge step over a vocab CTE
    * `$src`(word[, c], sym_str), with the winning pair read from CTE
    * `$best`(l, r): explode positions, match adjacent (l, r), keep
    * even offsets within each consecutive run, rebuild `$dst`. The
    * `$p` prefix keeps the training and encode chains' CTE names
    * disjoint; `carryC` threads the census count through (training
    * chain) or not (encode chain).
    */
  private def bpeRewrite(p: String, k: Int, src: String, dst: String,
                         best: String, carryC: Boolean,
                         injectAfterA: String = ""): String = {
    val cSel = if (carryC) "c, " else ""
    val cAgg = if (carryC) "any_value(a.c) AS c, " else ""
    s"""${p}e$k AS (
       |  SELECT word, ${cSel}CAST(u.i AS BIGINT) AS i,
       |         syms[CAST(u.i + 1 AS INTEGER)] AS sym
       |  FROM (SELECT word, ${cSel}string_split(sym_str, ' ') AS syms FROM $src) t,
       |       UNNEST(range(len(syms))) AS u(i)),
       |${p}a$k AS MATERIALIZED (
       |  SELECT word, ${cSel}i, sym,
       |         lead(sym) OVER (PARTITION BY word ORDER BY i) AS nx
       |  FROM ${p}e$k),$injectAfterA
       |${p}m$k AS (SELECT a.word, a.i FROM ${p}a$k a, $best b
       |        WHERE a.sym = b.l AND a.nx = b.r),
       |${p}g$k AS MATERIALIZED (
       |  SELECT word, i FROM (
       |    SELECT word, i, i - min(i) OVER (PARTITION BY word, rid) AS off
       |    FROM (SELECT word, i,
       |                 i - row_number() OVER (PARTITION BY word ORDER BY i) AS rid
       |          FROM ${p}m$k) rr) oo
       |  WHERE off % 2 = 0),
       |$dst AS MATERIALIZED (
       |  SELECT a.word, ${cAgg}
       |         string_agg(CASE WHEN g.i IS NOT NULL THEN a.sym || a.nx
       |                         ELSE a.sym END, ' ' ORDER BY a.i) AS sym_str
       |  FROM ${p}a$k a
       |  LEFT JOIN ${p}g$k g ON a.word = g.word AND a.i = g.i
       |  LEFT JOIN ${p}g$k s ON a.word = s.word AND a.i = s.i + 1
       |  WHERE s.i IS NULL
       |  GROUP BY a.word)""".stripMargin
  }

  /** The training chain: capped census `cen`, symbolized `v0`, and per
    * step k the winning-pair CTE `b$k` (from the pre-rewrite adjacency
    * `a$k`) plus the rewritten vocab `v${k+1}`.
    */
  private def bpeTrainChain: String = {
    val iters = (0 until graft.ops.Bpe.Merges).map { k =>
      // b$k must see THIS step's adjacency — injected between the
      // rewrite's a$k and its pair-match m$k through the seam
      val bCte =
        s"""
           |b$k AS MATERIALIZED (
           |  SELECT sym AS l, nx AS r, CAST(sum(c) AS BIGINT) AS cnt
           |  FROM a$k WHERE nx IS NOT NULL
           |  GROUP BY sym, nx ORDER BY cnt DESC, l, r LIMIT 1),""".stripMargin
      bpeRewrite("", k, s"v$k", s"v${k + 1}", s"b$k", carryC = true,
        injectAfterA = bCte)
    }.mkString(",\n")
    s"""cen AS (
       |  SELECT u.w AS word, CAST(count(*) AS BIGINT) AS c
       |  FROM documents, UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS u(w)
       |  GROUP BY u.w ORDER BY c DESC, word LIMIT ${graft.ops.Bpe.VocabCap}),
       |v0 AS (SELECT word, c,
       |         array_to_string(string_split(word, ''), ' ') AS sym_str
       |       FROM cen),
       |$iters""".stripMargin
  }

  val bpeTrain: String = {
    val steps = (0 until graft.ops.Bpe.Merges).map { k =>
      s"SELECT CAST($k AS BIGINT) AS step, l AS pair_left, r AS pair_right, l || r AS merged, cnt AS pair_count FROM b$k"
    }.mkString("\nUNION ALL ")
    s"""WITH $bpeTrainChain
       |$steps
       |ORDER BY step""".stripMargin
  }

  /** BPE corpus encoding mirror (ops.Bpe.bpeTokenCount recomputed):
    * the training chain's learned pairs b0..b{K-1} re-applied — in
    * learned order, same run-parity rewrite — to EVERY distinct
    * corpus word (not just the capped census), then tokens-per-word
    * joined back to the word stream and summed per doc.
    */
  val bpeEncode: String = {
    val k = graft.ops.Bpe.Merges
    val encIters = (0 until k).map { i =>
      bpeRewrite("x", i, s"w$i", s"w${i + 1}", s"b$i", carryC = false)
    }.mkString(",\n")
    s"""WITH $bpeTrainChain,
       |wd AS MATERIALIZED (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, u.w AS w
       |  FROM documents, UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS u(w)),
       |w0 AS (SELECT w AS word,
       |         array_to_string(string_split(w, ''), ' ') AS sym_str
       |       FROM (SELECT DISTINCT w FROM wd) dw),
       |$encIters,
       |tok AS (SELECT word,
       |          CAST(len(string_split(sym_str, ' ')) AS BIGINT) AS n_toks
       |        FROM w$k),
       |per AS (SELECT wd.doc_id, count(*) AS n_words, sum(t.n_toks) AS n_bpe_tokens
       |        FROM wd JOIN tok t ON wd.w = t.word GROUP BY wd.doc_id)
       |SELECT d.doc_id, CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(p.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
       |FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
       |LEFT JOIN per p USING (doc_id) ORDER BY d.doc_id""".stripMargin
  }

  /** Mixture balancing mirror: per-lang rate = min_n*1000 // n (all
    * positive, so `//` == Spark DIV), keep set via the splitmix chain.
    */
  val mixBalance: String = {
    val seedU = java.lang.Long.toUnsignedString(TextOps.MixSeed)
    s"""WITH rates AS (
       |  SELECT lang, count(*) AS n_docs,
       |    (min(count(*)) OVER ()) * 1000 // count(*) AS rate_permille
       |  FROM documents GROUP BY lang),
       |s0 AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       |       ${xor64("CAST(doc_id AS HUGEINT)", s"$seedU::HUGEINT")} AS x
       |       FROM documents),
       |${splitmixCtes("mx", "s0", "doc_id, lang")},
       |kept AS (
       |  SELECT s.lang, count(*) AS n_kept
       |  FROM mx6 s JOIN rates r USING (lang)
       |  WHERE s.hk % 1000 < r.rate_permille GROUP BY s.lang)
       |SELECT r.lang, CAST(r.n_docs AS BIGINT) AS n_docs,
       |  CAST(r.rate_permille AS BIGINT) AS rate_permille,
       |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
       |FROM rates r LEFT JOIN kept k USING (lang) ORDER BY lang""".stripMargin
  }

  /** Temperature-weighted mixture sampling mirror (alpha = 1/2,
    * budget = total//2): rate = least(1000, (B*1000*isqrt(n)) //
    * (S*n)) with TextOps.isqrtSql's exact integer sqrt (the SAME
    * expression string — floor(sqrt(double)) + ±1 fix-up, so
    * cross-engine sqrt rounding cannot diverge), kept set via the
    * splitmix chain on doc_id xor TempSeed. DuckDB window sums widen
    * to HUGEINT — all terms positive, so `//` == Spark DIV; the outer
    * BIGINT casts restore the driver-hashable types.
    */
  /** Temperature-mixture CTE chain (TextOps.mixRates + the splitmix
    * hash view), ending in `rates(lang, n_docs, rate_permille)` and
    * `mt6(doc_id, lang, hk)` — ONE generated source for the
    * mix_temperature census and the mix_sample materialization (the
    * mix_temperature branch is byte-identical to the historical
    * string; a rate or seed change hits both rows).
    */
  private val mixChainCtes: String = {
    val seedU = java.lang.Long.toUnsignedString(TextOps.TempSeed)
    val isq = TextOps.isqrtSql("n_docs")
    s"""counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
       |rates AS (
       |  SELECT lang, n_docs,
       |    least(1000, ((sum(n_docs) OVER ()) // 2) * 1000 * $isq
       |                // ((sum($isq) OVER ()) * n_docs)) AS rate_permille
       |  FROM counts),
       |s0 AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       |       ${xor64("CAST(doc_id AS HUGEINT)", s"$seedU::HUGEINT")} AS x
       |       FROM documents),
       |${splitmixCtes("mt", "s0", "doc_id, lang")}""".stripMargin
  }

  /** UniMax water-filling mirror (TextOps.mixUnimax): the sequential
    * allocation loop unrolled to UniMaxUnrollSteps single-row budget
    * CTEs — step k holds the remaining budget after the k-th
    * smallest-capacity stratum takes min(cap, rem // strata_left);
    * the final select recomputes each stratum's allocation from its
    * step's incoming budget. The epoch cap and step count are the
    * SAME Scala values the kernel uses (the kernel fail-louds past
    * the unroll depth); denominators are greatest(..,1)-guarded so
    * the unused unroll tail (k > #strata) stays total; the window
    * sum is cast BIGINT at the source against HUGEINT widening.
    */
  /** Census body shared by the doc-unit UniMax rows (the default
    * branch of [[unimaxChainCtesOf]] — byte-identical to the
    * historical inline text).
    */
  private val unimaxDocCensus: String =
    "SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang"

  private val unimaxChainCtes: String = unimaxChainCtesOf(unimaxDocCensus)

  /** The UniMax allocation chain with the stratum-mass census
    * parameterized (docs for mix_unimax/_sample, whitespace token
    * mass for mix_unimax_tokens) — ONE loop definition for every
    * unit; the doc-census branch is byte-identical to the historical
    * string (re-diff oracle_sql.json if touched).
    */
  private def unimaxChainCtesOf(censusSel: String): String = {
    val e = TextOps.UniMaxEpochCap
    val k = TextOps.UniMaxUnrollSteps
    val steps = (1 to k).map { i =>
      s"""a$i AS (SELECT max(a${i - 1}.rem) - coalesce(max(least(cap,
         |  a${i - 1}.rem // greatest(nl - ${i - 1}, 1))) FILTER (rk = $i), 0) AS rem
         |  FROM caps, a${i - 1})""".stripMargin
    }.mkString(",\n")
    val cases = (1 to k).map { i =>
      s"WHEN $i THEN least(c.cap, a${i - 1}.rem // greatest(c.nl - ${i - 1}, 1))"
    }.mkString("\n    ")
    val froms = (0 until k).map(i => s"a$i").mkString(", ")
    s"""census AS (
       |  $censusSel),
       |caps AS (SELECT lang, n, n * $e AS cap,
       |  row_number() OVER (ORDER BY n * $e, lang) AS rk,
       |  CAST(count(*) OVER () AS BIGINT) AS nl,
       |  CAST(sum(n) OVER () AS BIGINT) AS total FROM census),
       |a0 AS (SELECT (3 * max(total)) // 2 AS rem FROM caps),
       |$steps,
       |alloc AS (SELECT c.lang, c.n, c.cap,
       |  CASE c.rk $cases END AS alloc
       |  FROM caps c, $froms)""".stripMargin
  }

  val mixUnimax: String =
    s"""WITH $unimaxChainCtes
       |SELECT lang, CAST(n AS BIGINT) AS n_docs, CAST(cap AS BIGINT) AS cap_docs,
       |  CAST(alloc AS BIGINT) AS alloc_docs,
       |  CAST(alloc * 1000 // n AS BIGINT) AS epochs_milli
       |FROM alloc ORDER BY lang""".stripMargin

  /** Token-budget UniMax mirror (TextOps.mixUnimaxTokens — the
    * published UniMax budgets TOKEN mass, not doc count): the SAME
    * allocation chain keyed on per-lang whitespace token mass (the
    * token_count nw expression, summed with a BIGINT cast at the
    * source against HUGEINT widening).
    */
  val mixUnimaxTokens: String =
    s"""WITH ${unimaxChainCtesOf(
           "SELECT lang, CAST(sum(length(text) - length(replace(text, ' ', '')) + 1)" +
             " AS BIGINT) AS n FROM documents GROUP BY lang")}
       |SELECT lang, CAST(n AS BIGINT) AS n_tokens, CAST(cap AS BIGINT) AS cap_tokens,
       |  CAST(alloc AS BIGINT) AS alloc_tokens,
       |  CAST(alloc * 1000 // n AS BIGINT) AS epochs_milli
       |FROM alloc ORDER BY lang""".stripMargin

  /** Row-level UniMax materialization mirror (TextOps.mixUnimaxSample):
    * the SAME allocation chain; per lang, floor(alloc/n) full-epoch
    * copies for every doc plus one more for docs clearing the
    * fractional-remainder permille under the UniSeed splitmix draw;
    * zero-copy docs are dropped.
    */
  val mixUnimaxSample: String = {
    val seedU = java.lang.Long.toUnsignedString(TextOps.UniSeed)
    s"""WITH $unimaxChainCtes,
       |rates AS (SELECT lang, alloc // n AS ef,
       |  ((alloc - (alloc // n) * n) * 1000) // n AS rem_permille
       |  FROM alloc),
       |s0 AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       |  ${xor64("CAST(doc_id AS HUGEINT)", s"$seedU::HUGEINT")} AS x
       |  FROM documents),
       |${splitmixCtes("um", "s0", "doc_id, lang")},
       |cop AS (SELECT s.doc_id, s.lang,
       |  r.ef + CASE WHEN s.hk % 1000 < r.rem_permille THEN 1 ELSE 0 END AS n_copies
       |  FROM um6 s JOIN rates r USING (lang))
       |SELECT doc_id, lang, CAST(n_copies AS BIGINT) AS n_copies
       |FROM cop WHERE n_copies > 0 ORDER BY doc_id""".stripMargin
  }

  val mixTemperature: String =
    s"""WITH $mixChainCtes,
       |kept AS (
       |  SELECT s.lang, count(*) AS n_kept
       |  FROM mt6 s JOIN rates r USING (lang)
       |  WHERE s.hk % 1000 < r.rate_permille GROUP BY s.lang)
       |SELECT r.lang, CAST(r.n_docs AS BIGINT) AS n_docs,
       |  CAST(r.rate_permille AS BIGINT) AS rate_permille,
       |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
       |FROM rates r LEFT JOIN kept k USING (lang) ORDER BY lang""".stripMargin

  /** Row-level temperature-mixture admission mirror
    * (TextOps.mixSample): the SAME chain, emitting the kept
    * (doc_id, lang) rows instead of the per-stratum census.
    */
  val mixSample: String =
    s"""WITH $mixChainCtes
       |SELECT s.doc_id, s.lang
       |FROM mt6 s JOIN rates r USING (lang)
       |WHERE s.hk % 1000 < r.rate_permille
       |ORDER BY s.doc_id""".stripMargin

  /** Token-mass temperature-mixture mirror (TextOps.mixTokens): the
    * alpha = 1/2 rate rule over per-lang TOKEN mass (the token_count
    * space-count+1 kernel summed per stratum) instead of doc counts,
    * admission by splitmix64(doc_id xor TokSeed) mod 1000. Docs are
    * admitted whole; kept_tokens sums the admitted docs' token
    * counts. All HUGEINT-widened aggregates CAST back to BIGINT.
    */
  val mixTokens: String = {
    val seedU = java.lang.Long.toUnsignedString(TextOps.TokSeed)
    val isq = TextOps.isqrtSql("tok_mass")
    s"""WITH counts AS (
       |  SELECT lang,
       |    CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS tok_mass
       |  FROM documents GROUP BY lang),
       |rates AS (
       |  SELECT lang, tok_mass,
       |    least(1000, ((sum(tok_mass) OVER ()) // 2) * 1000 * $isq
       |      // ((sum($isq) OVER ()) * tok_mass)) AS rate_permille
       |  FROM counts),
       |s0 AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       |       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
       |       ${xor64("CAST(doc_id AS HUGEINT)", s"$seedU::HUGEINT")} AS x
       |       FROM documents),
       |${splitmixCtes("mk", "s0", "doc_id, lang, n_tokens")},
       |kept AS (
       |  SELECT s.lang, CAST(sum(s.n_tokens) AS BIGINT) AS kept_tokens
       |  FROM mk6 s JOIN rates r USING (lang)
       |  WHERE s.hk % 1000 < r.rate_permille GROUP BY s.lang)
       |SELECT r.lang, CAST(r.tok_mass AS BIGINT) AS tok_mass,
       |  CAST(r.rate_permille AS BIGINT) AS rate_permille,
       |  CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
       |FROM rates r LEFT JOIN kept k USING (lang) ORDER BY lang""".stripMargin
  }

  /** Quality-classifier inference mirror: per-distinct-word weight via
    * the FNV→xor-seed→splitmix chain, summed per occurrence, truncated
    * mean (`//` toward zero == JVM `/`).
    */
  val qualityClassify: String = {
    val seedU = java.lang.Long.toUnsignedString(TextOps.QualityClassifySeed)
    s"""WITH wx AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, u.w
       |  FROM documents, UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS u(w)),
       |dw AS (SELECT DISTINCT w FROM wx),
       |fv AS (SELECT w, ${fnvU("w")} AS h FROM dw),
       |sx AS (SELECT w, ${xor64("fv.h", s"$seedU::HUGEINT")} AS x FROM fv),
       |${splitmixCtes("qc", "sx", "w")},
       |wt AS (SELECT w, CAST(hk % 2001 AS BIGINT) - 1000 AS wt FROM qc6),
       |agg AS (
       |  SELECT wx.doc_id, count(*) AS n_words, CAST(sum(wt.wt) AS BIGINT) AS s
       |  FROM wx JOIN wt USING (w) GROUP BY wx.doc_id)
       |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       |  CAST(COALESCE(agg.n_words, 0) AS BIGINT) AS n_words,
       |  CAST(COALESCE(agg.s // agg.n_words, 0) AS BIGINT) AS score_milli,
       |  COALESCE((agg.s // agg.n_words) >= 0, TRUE) AS keep
       |FROM documents d LEFT JOIN agg ON CAST(d.doc_id AS BIGINT) = agg.doc_id
       |ORDER BY doc_id""".stripMargin
  }

  /** DSIR importance-weight mirror (ops.TextOps.dsirWeights): bigrams
    * of the space-split word list, feature-hashed with the SAME
    * fnv1a64-mod-NBuckets kernel as the classifier; per-bucket share =
    * tc·1000 // rc (target = lang 'en' occurrences); doc weight = sum
    * of its grams' shares. LEFT JOIN + COALESCE so sub-2-word docs
    * emit zero rows on both engines; every aggregate CAST back to
    * BIGINT (DuckDB SUM widens to HUGEINT).
    */
  /** DSIR CTE chain ending in `doc(doc_id, n_grams, w_sum)` — ONE
    * generated source for the dsir_weights scoring row and the
    * dsir_sample admission row (the dsir_weights branch is
    * byte-identical to the historical string; a bucket-count or
    * target-slice change hits both rows).
    */
  private val dsirChainCtes: String = {
    val nB = graft.ops.Classifier.NBuckets
    s"""w0 AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, lang, u.gram
       |  FROM w0, UNNEST(list_transform(range(1, len(ws)),
       |                                 i -> ws[i] || ' ' || ws[i+1])) AS u(gram)),
       |dg AS (SELECT DISTINCT gram FROM g),
       |fv AS (SELECT gram, CAST(${fnvU("gram")} % $nB::HUGEINT AS BIGINT) AS bucket FROM dg),
       |gb AS (SELECT doc_id, lang, bucket FROM g JOIN fv USING (gram)),
       |census AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS rc,
       |         CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS tc
       |  FROM gb GROUP BY bucket),
       |share AS (SELECT bucket, CAST(tc * 1000 // rc AS BIGINT) AS s FROM census),
       |doc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |         CAST(sum(s) AS BIGINT) AS w_sum
       |  FROM gb JOIN share USING (bucket) GROUP BY doc_id)""".stripMargin
  }

  val dsirWeights: String =
    s"""WITH $dsirChainCtes
       |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       |  CAST(COALESCE(doc.n_grams, 0) AS BIGINT) AS n_grams,
       |  CAST(COALESCE(doc.w_sum, 0) AS BIGINT) AS w_sum,
       |  CAST(CASE WHEN COALESCE(doc.n_grams, 0) = 0 THEN 0
       |       ELSE doc.w_sum * 1000 // doc.n_grams END AS BIGINT) AS w_avg_milli
       |FROM documents d LEFT JOIN doc ON CAST(d.doc_id AS BIGINT) = doc.doc_id
       |ORDER BY doc_id""".stripMargin

  /** DSIR admission mirror (TextOps.dsirSample): the SAME weight
    * chain, then exact integer rejection sampling — admit iff
    * splitmix64(doc_id xor DsirSeed) mod DsirAcceptMod < w_avg_milli
    * (weights are MICRO-scaled acceptance probabilities, 0..10^6;
    * sub-2-word docs carry weight 0 and never pass).
    */
  val dsirSample: String = {
    val seedU = java.lang.Long.toUnsignedString(graft.ops.TextOps.DsirSeed)
    val mod = graft.ops.TextOps.DsirAcceptMod
    s"""WITH $dsirChainCtes,
       |wts AS (
       |  SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       |    CAST(CASE WHEN COALESCE(doc.n_grams, 0) = 0 THEN 0
       |         ELSE doc.w_sum * 1000 // doc.n_grams END AS BIGINT) AS w_avg_milli
       |  FROM documents d LEFT JOIN doc ON CAST(d.doc_id AS BIGINT) = doc.doc_id),
       |sx AS (SELECT doc_id, w_avg_milli,
       |       ${xor64("CAST(doc_id AS HUGEINT)", s"$seedU::HUGEINT")} AS x FROM wts),
       |${splitmixCtes("dsp", "sx", "doc_id, w_avg_milli")}
       |SELECT doc_id, w_avg_milli FROM dsp6
       |WHERE hk % $mod < w_avg_milli
       |ORDER BY doc_id""".stripMargin
  }

  /** Classifier TRAINING mirror (ops.Classifier.qualityTrain):
    * hashed-unigram presence features (fnv1a64 mod NBuckets), planted
    * lexicon labels (splitmix64(fnv) mod 17 == 0), one-pass purity
    * induction on the even-doc_id train half (pd >= minSupport AND
    * pd·Nneg > nd·Npos·purityFactor — all-integer odds), scoring =
    * selected-bucket hit count per doc. Every aggregate CAST back to
    * BIGINT (DuckDB widens SUM to HUGEINT); constants pinned to the
    * Scala defaults.
    */
  val qualityTrain: String = {
    val nB = graft.ops.Classifier.NBuckets
    val purityFactor = 5L
    val minSupport = 2L
    s"""WITH words AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, u.w
       |  FROM documents, UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS u(w)),
       |dw AS (SELECT DISTINCT w FROM words),
       |fv AS (SELECT w, ${fnvU("w")} AS h FROM dw),
       |sx AS (SELECT w, h AS x FROM fv),
       |${splitmixCtes("qt", "sx", "w")},
       |wb AS (
       |  SELECT fv.w, CAST(fv.h % $nB::HUGEINT AS BIGINT) AS bucket,
       |         (qt6.hk % 17::HUGEINT = 0::HUGEINT) AS in_lex
       |  FROM fv JOIN qt6 USING (w)),
       |docb AS (
       |  SELECT DISTINCT doc_id, bucket FROM words JOIN wb USING (w)),
       |lab AS (
       |  SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       |         CASE WHEN COALESCE(lx.has, FALSE)
       |              THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y
       |  FROM documents d LEFT JOIN (
       |    SELECT doc_id, bool_or(in_lex) AS has
       |    FROM words JOIN wb USING (w) GROUP BY doc_id) lx
       |  ON CAST(d.doc_id AS BIGINT) = lx.doc_id),
       |tot AS (
       |  SELECT CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np,
       |         CAST(SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS nn
       |  FROM lab WHERE doc_id % 2 = 0),
       |cls AS (
       |  SELECT d.bucket,
       |         CAST(SUM(CASE WHEN l.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pd,
       |         CAST(SUM(CASE WHEN l.y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS nd
       |  FROM docb d JOIN lab l USING (doc_id)
       |  WHERE d.doc_id % 2 = 0 GROUP BY d.bucket),
       |sel AS (
       |  SELECT bucket FROM cls, tot
       |  WHERE pd >= $minSupport
       |    AND CAST(pd AS HUGEINT) * nn > CAST(nd AS HUGEINT) * np * $purityFactor),
       |hits AS (
       |  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM docb d JOIN sel USING (bucket) GROUP BY d.doc_id)
       |SELECT l.doc_id, l.y AS label,
       |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       |  COALESCE(h.n_hits, 0) > 0 AS pred,
       |  (l.doc_id % 2 = 1) AS holdout
       |FROM lab l LEFT JOIN hits h USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Holdout evaluation mirror (ops.Classifier.qualityEval): the full
    * [[qualityTrain]] mirror as a derived table, filtered to the odd
    * (holdout) half, aggregated to confusion counts + integer-exact
    * permille metrics. count(*) FILTER keeps every output BIGINT (the
    * type audit bans HUGEINT); `//` is DuckDB's truncating division ==
    * Spark DIV on non-negative counts.
    */
  val qualityEval: String =
    s"""WITH qt AS ($qualityTrain),
       |conf AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_holdout,
       |    CAST(count(*) FILTER (WHERE label = 1 AND pred) AS BIGINT) AS tp,
       |    CAST(count(*) FILTER (WHERE label = -1 AND pred) AS BIGINT) AS fp,
       |    CAST(count(*) FILTER (WHERE label = 1 AND NOT pred) AS BIGINT) AS fn,
       |    CAST(count(*) FILTER (WHERE label = -1 AND NOT pred) AS BIGINT) AS tn
       |  FROM qt WHERE holdout)
       |SELECT n_holdout, tp, fp, fn, tn,
       |  CAST(CASE WHEN tp + fp = 0 THEN 0 ELSE tp * 1000 // (tp + fp) END AS BIGINT) AS precision_permille,
       |  CAST(CASE WHEN tp + fn = 0 THEN 0 ELSE tp * 1000 // (tp + fn) END AS BIGINT) AS recall_permille,
       |  CAST(CASE WHEN tp + fp + fn + tn = 0 THEN 0 ELSE (tp + tn) * 1000 // (tp + fp + fn + tn) END AS BIGINT) AS accuracy_permille
       |FROM conf""".stripMargin

  /** Deterministic stratified sampling mirror: splitmix64(doc_id xor
    * seed) unsigned mod 1000 under the per-lang permille rate.
    */
  val stratSample: String = {
    val seedU = java.lang.Long.toUnsignedString(TextOps.SampleSeed)
    s"""WITH s0 AS (
       |  SELECT doc_id, lang,
       |         ${xor64("CAST(doc_id AS HUGEINT)", s"$seedU::HUGEINT")} AS x
       |  FROM documents),
       |${splitmixCtes("sm", "s0", "doc_id, lang")}
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang FROM sm6
       |WHERE hk % 1000 < CASE WHEN lang = 'en' THEN 500 ELSE 200 END
       |ORDER BY doc_id""".stripMargin
  }

  /** End-to-end curation-funnel mirror (CurateJob.funnel defaults):
    * planted corpus (base ∪ near-dups +1e6 ∪ exact copies +2e6, plus a
    * url REVISIT row per doc_id%10==5) → url-dedup (min-sha256 per
    * url) → quality gate (minTokens 5, punct*5<=len, n_distinct*2>nw)
    * → exact + MinHash edges over the GATED corpus → recursive-CTE
    * connected components → component-minimum survivors → splitmix64
    * sampling at 900‰ → bucketed token-budget shard packing (budget
    * 4096). Every kernel is the SAME fragment its standalone oracle
    * uses (minhashEdgeCtes, splitmixCtes, the shard_pack window); the
    * window sum takes the OUTER BIGINT cast (DuckDB widens to
    * HUGEINT).
    *
    * Plan-shape constraints (all MEASURED, DuckDB 1.x): a RECURSIVE
    * with-clause inlines every CTE into every reference — the
    * recursion re-executed the whole minhash chain per iteration
    * (54 s) until `sym AS MATERIALIZED`, and a predicate over the
    * 6-level splitmix chain inside the recursive scope exploded
    * exponentially during pushdown (OOM at 128 GB). Hence the split:
    * the recursion lives in a derived-table subquery (the dup_stats
    * precedent), the splitmix chain in a plain outer WITH over a
    * MATERIALIZED `s0` (each chain level would otherwise inline and
    * re-run the subquery — 22 s → 4.5 s). MATERIALIZED on other inner
    * CTEs (corpus, jac, shd) itself OOMs — do not add hints here
    * without re-measuring.
    */
  /** Skewed host id of an arbitrary doc-id expression — mirror of
    * GraphOps.hostIdCol / PageSource.hostId (single SQL source:
    * SparkEntry's page-derivation fragments delegate here).
    */
  private[graft] def hidOfSql(x: String): String =
    s"CASE WHEN ($x) % 2 = 0 THEN 0 WHEN ($x) % 4 = 3 THEN 1 + (($x) % 9) ELSE 10 + (($x) % 990) END"

  /** The funnel-survivor CTE shared by the curate_funnel oracles:
    * `s0(doc_id, nw, x)` — one row per canonical survivor with its
    * splitmix input x, the recursion confined to the inner derived
    * table (see [[curateFunnel]] for the measured plan-shape
    * constraints that force this structure).
    */
  private def curateDerived(cteName: String, outerCols: String,
                            innerSelect: String): String = {
    val nw = "(length(text) - length(replace(text, ' ', '')) + 1)"
    val np = "(length(text) - length(replace(replace(replace(replace(replace(replace(" +
      "text, '.', ''), ',', ''), '!', ''), '?', ''), ';', ''), ':', '')))"
    s"""$cteName AS MATERIALIZED (
       |  SELECT $outerCols
       |  FROM (
       |    WITH RECURSIVE corpus0 AS (
       |      SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
       |      UNION ALL
       |      SELECT doc_id + 1000000 AS doc_id,
       |             substring(text, 1, length(text) - instr(reverse(text), ' ')) AS text
       |      FROM documents WHERE doc_id % 10 = 0),
       |    corpusx AS (
       |      SELECT doc_id, text FROM corpus0
       |      UNION ALL
       |      SELECT doc_id + 2000000 AS doc_id, text FROM corpus0 WHERE doc_id % 20 = 0),
       |    raw AS (
       |      SELECT doc_id, printf('https://curate.example/d/%d', doc_id) AS url_norm, text
       |      FROM corpusx
       |      UNION ALL
       |      SELECT doc_id, printf('https://curate.example/d/%d', doc_id) AS url_norm,
       |             'rev ' || text AS text
       |      FROM corpusx WHERE doc_id % 10 = 5),
       |    urld AS (
       |      SELECT doc_id, text FROM (
       |        SELECT doc_id, text,
       |               row_number() OVER (PARTITION BY url_norm ORDER BY sha256(text)) AS rn
       |        FROM raw) t WHERE rn = 1),
       |    gcorp AS (
       |      SELECT doc_id, text, nw FROM (
       |        SELECT doc_id, text, $nw AS nw, $np AS np,
       |               len(list_distinct(string_split(text, ' '))) AS nd
       |        FROM urld) t
       |      WHERE nw >= 5 AND np * 5 <= length(text) AND NOT (nd * 2 <= nw)),
       |    corpus AS (SELECT doc_id, text FROM gcorp),
       |    $minhashEdgeCtes,
       |    near_edges AS (SELECT doc_a, doc_b FROM jac WHERE jaccard_milli >= 700),
       |    exact_edges AS (
       |      SELECT min_id AS doc_a, doc_id AS doc_b FROM (
       |        SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS min_id FROM corpus) t
       |      WHERE doc_id <> min_id),
       |    edges AS (SELECT doc_a, doc_b FROM near_edges
       |              UNION ALL SELECT doc_a, doc_b FROM exact_edges),
       |    sym AS MATERIALIZED (
       |        SELECT doc_a AS src, doc_b AS dst FROM edges
       |        UNION ALL SELECT doc_b AS src, doc_a AS dst FROM edges),
       |    cc AS (
       |      SELECT doc_id AS node, doc_id AS label FROM corpus
       |      UNION
       |      SELECT s.dst AS node, cc.label FROM cc JOIN sym s ON s.src = cc.node),
       |    lab AS (SELECT node AS doc_id, min(label) AS cluster_id FROM cc GROUP BY node)
       |    $innerSelect) surv)""".stripMargin
  }

  private val curateS0: String = {
    val seedU = java.lang.Long.toUnsignedString(TextOps.SampleSeed)
    curateDerived("s0",
      s"""doc_id, nw,
         |         ${xor64("CAST(doc_id AS HUGEINT)", s"$seedU::HUGEINT")} AS x""".stripMargin,
      """SELECT g.doc_id, g.nw FROM gcorp g JOIN lab l USING (doc_id)
        |    WHERE l.doc_id = l.cluster_id""".stripMargin)
  }

  val curateFunnel: String =
    s"""WITH $curateS0,
       |${splitmixCtes("cf", "s0", "doc_id, nw")}
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(nw AS BIGINT) AS n_tokens,
       |  CAST(doc_id % 8 AS BIGINT) AS bucket,
       |  CAST((sum(nw) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) - nw) // 4096 AS BIGINT) AS shard
       |FROM cf6 WHERE hk % 1000 < 900 ORDER BY doc_id""".stripMargin

  /** [[curateFunnel]] with the per-domain cap branch ON
    * (CurateJob.funnel maxDocsPerHost = 8): the query's planted urls
    * carry doc_id%7 host labels, so the Spark side parses hosts
    * through the REAL TextOps.hostOf chain while the mirror
    * re-derives the identical partition key from doc_id%7 (the parse
    * is bijective on these urls). Cap = single-window replay of the
    * salted two-phase TextOps.hostCap (provably equal — operator
    * scaladoc), applied between clustering and sampling, exactly
    * where the funnel applies it.
    */
  val curateFunnelCap: String =
    s"""WITH $curateS0,
       |capped AS (
       |  SELECT doc_id, nw, x FROM (
       |    SELECT doc_id, nw, x,
       |      row_number() OVER (
       |        PARTITION BY doc_id % 7
       |        ORDER BY nw DESC, doc_id ASC) AS rn
       |    FROM s0) t WHERE rn <= 8),
       |${splitmixCtes("cf", "capped", "doc_id, nw")}
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(nw AS BIGINT) AS n_tokens,
       |  CAST(doc_id % 8 AS BIGINT) AS bucket,
       |  CAST((sum(nw) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) - nw) // 4096 AS BIGINT) AS shard
       |FROM cf6 WHERE hk % 1000 < 900 ORDER BY doc_id""".stripMargin

  /** [[curateFunnel]] with the authority-weighted sampling branch ON
    * (CurateJob.funnel authorityPermille = 1000/600/200‰, planted-
    * arithmetic path): the PageRank loop runs over the SURVIVOR set —
    * ids reduced mod GraphOps.HostIdModulus, the survivor count as the
    * planted citation modulus (hostRank counts the frame it is handed,
    * which is the scrubbed/canonical set) — then ntile(3) tiers, the
    * per-tier permille against the SAME splitmix key, and the shared
    * shard-pack window. Damping 850/1000, base 150, 3 iterations —
    * the host_rank oracle's kernel over a different doc universe.
    */
  val curateFunnelAuth: String = {
    def hostOf(x: String) = s"'host' || CAST(${hidOfSql(x)} AS VARCHAR) || '.example'"
    val rounds = (1 to 3).map { k =>
      s"""ar$k AS (
         |  SELECT anodes.host,
         |    CAST(150 + COALESCE(s.inflow, 0) AS BIGINT) AS rank_milli
         |  FROM anodes LEFT JOIN (
         |    SELECT e.dst AS host,
         |           sum(r.rank_milli * 850 * e.w // (1000 * o.od)) AS inflow
         |    FROM aedges e JOIN aoutdeg o USING (src)
         |    JOIN ar${k - 1} r ON r.host = e.src
         |    GROUP BY e.dst) s USING (host))""".stripMargin
    }.mkString(",\n")
    s"""WITH $curateS0,
       |${splitmixCtes("cf", "s0", "doc_id, nw")},
       |rd AS (SELECT doc_id % ${GraphOps.HostIdModulus} AS rid FROM s0),
       |ae0 AS (
       |  SELECT ${hostOf("rid")} AS src,
       |         ${hostOf("(rid * 31 + 7) % (SELECT count(*) FROM s0)")} AS dst
       |  FROM rd),
       |aedges AS (SELECT src, dst, count(*) AS w FROM ae0 WHERE src <> dst GROUP BY src, dst),
       |aoutdeg AS (SELECT src, CAST(sum(w) AS BIGINT) AS od FROM aedges GROUP BY src),
       |anodes AS (SELECT DISTINCT ${hostOf("rid")} AS host FROM rd),
       |ar0 AS (SELECT host, CAST(1000 AS BIGINT) AS rank_milli FROM anodes),
       |$rounds,
       |tiers AS (
       |  SELECT host, ntile(3) OVER (ORDER BY rank_milli DESC, host ASC) AS tier
       |  FROM ar3),
       |kept AS (
       |  SELECT c.doc_id, c.nw FROM cf6 c
       |  JOIN tiers t ON t.host = ${hostOf(s"c.doc_id % ${GraphOps.HostIdModulus}")}
       |  WHERE c.hk % 1000 < CASE t.tier WHEN 1 THEN 1000 WHEN 2 THEN 600 ELSE 200 END)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(nw AS BIGINT) AS n_tokens,
       |  CAST(doc_id % 8 AS BIGINT) AS bucket,
       |  CAST((sum(nw) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) - nw) // 4096 AS BIGINT) AS shard
       |FROM kept ORDER BY doc_id""".stripMargin
  }

  /** Per-doc funnel audit mirror (CurateJob.auditFunnel recomputed):
    * the SAME derived-table body as the funnel oracles
    * ([[curateDerived]]) with an audit tail — every url-deduped doc
    * labeled with the FIRST stage that rejected it (quality /
    * duplicate), survivors split admitted vs sampled_out by the same
    * splitmix chain the funnel samples with.
    */
  val curateAudit: String = {
    val seedU = java.lang.Long.toUnsignedString(TextOps.SampleSeed)
    val s0a = curateDerived("s0a",
      s"""doc_id, stage0,
         |         ${xor64("CAST(doc_id AS HUGEINT)", s"$seedU::HUGEINT")} AS x""".stripMargin,
      """SELECT u.doc_id,
        |      CASE WHEN g.doc_id IS NULL THEN 'quality'
        |           WHEN k.doc_id IS NULL THEN 'duplicate'
        |           ELSE 'canonical' END AS stage0
        |    FROM urld u
        |    LEFT JOIN gcorp g ON u.doc_id = g.doc_id
        |    LEFT JOIN (SELECT doc_id FROM lab WHERE doc_id = cluster_id) k
        |           ON u.doc_id = k.doc_id""".stripMargin)
    s"""WITH $s0a,
       |${splitmixCtes("ca", "s0a", "doc_id, stage0")}
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CASE WHEN stage0 <> 'canonical' THEN stage0
       |       WHEN hk % 1000 < 900 THEN 'admitted'
       |       ELSE 'sampled_out' END AS stage
       |FROM ca6 ORDER BY doc_id""".stripMargin
  }

  /** Morton bit-spread of a 16-bit SQL expression, generated from the
    * SAME mask/shift schedule the Spark kernel uses
    * (graft.ops.Layout.SpreadSteps) — one source of truth.
    */
  private def spreadSql(x: String): String =
    graft.ops.Layout.SpreadSteps.foldLeft(x) { case (e, (s, m)) =>
      s"((($e) | (($e) << $s)) & $m)"
    }

  /** Bit width of a non-negative BIGINT range — the SQL twin of
    * 64 - numberOfLeadingZeros(range) (min s in [0,63] with
    * range >> s = 0; range <= 2^63-1 so s = 63 always terminates).
    */
  private def bitsSql(range: String): String =
    s"(SELECT min(r.range) FROM range(0,64) r WHERE (($range) >> r.range) = 0)"

  /** zorder_layout mirror: per-cell envelope census of the 32-bit
    * Morton key over (n_chars, doc_id) — bounds and quantizer shifts
    * derived in SQL exactly as the driver derives them in Scala, the
    * spread chain generated from Layout.SpreadSteps, cell = top 5 bits
    * (32 cells). All-BIGINT arithmetic (inputs are 16-bit buckets).
    */
  val zorderLayout: String = {
    val za = spreadSql("((d.n_chars - sh.a_min) >> sh.sa) << sh.ua")
    val zb = spreadSql("((d.doc_id - sh.b_min) >> sh.sb) << sh.ub")
    s"""WITH b AS (
       |  SELECT CAST(min(n_chars) AS BIGINT) AS a_min, CAST(max(n_chars) AS BIGINT) AS a_max,
       |         CAST(min(doc_id) AS BIGINT) AS b_min, CAST(max(doc_id) AS BIGINT) AS b_max
       |  FROM documents),
       |bw AS (
       |  SELECT a_min, b_min,
       |    ${bitsSql("b.a_max - b.a_min")} AS ba,
       |    ${bitsSql("b.b_max - b.b_min")} AS bb
       |  FROM b),
       |sh AS (
       |  SELECT a_min, b_min,
       |    greatest(0, ba - 16) AS sa, greatest(0, 16 - ba) AS ua,
       |    greatest(0, bb - 16) AS sb, greatest(0, 16 - bb) AS ub
       |  FROM bw),
       |keyed AS (
       |  SELECT ($za) | (($zb) << 1) AS zkey,
       |    CAST(d.n_chars AS BIGINT) AS a, CAST(d.doc_id AS BIGINT) AS b
       |  FROM documents d, sh)
       |SELECT CAST(zkey >> 27 AS BIGINT) AS cell_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  min(a) AS a_min, max(a) AS a_max, min(b) AS b_min, max(b) AS b_max
       |FROM keyed GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** RAG-chunking mirror (TextOps.chunkOverlap): same word windows,
    * but begin_char derived by a DIFFERENT route — length of the
    * joined word prefix + 1 vs Spark's fold of len(word)+1 — so the
    * offset contract is cross-verified, not echoed. Geometry embedded
    * from the ONE Scala constant pair (ChunkWords/ChunkStride).
    */
  val chunkOverlap: String = {
    val w = TextOps.ChunkWords
    val s = TextOps.ChunkStride
    s"""WITH base AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |  FROM documents),
       |k AS (
       |  SELECT doc_id, ws,
       |    CASE WHEN len(ws) <= $w THEN 1
       |         ELSE 1 + (len(ws) - $w + ${s - 1}) // $s END AS nk
       |  FROM base),
       |c AS (
       |  SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_id,
       |    CAST(u.i * $s AS BIGINT) AS begin_word,
       |    CASE WHEN u.i = 0 THEN 0
       |         ELSE length(array_to_string(ws[1:CAST(u.i * $s AS INTEGER)], ' ')) + 1 END AS begin_char,
       |    ws[CAST(u.i * $s + 1 AS INTEGER):CAST(u.i * $s + $w AS INTEGER)] AS cw
       |  FROM k, UNNEST(range(nk)) AS u(i))
       |SELECT doc_id, chunk_id, begin_word,
       |  CAST(begin_char AS BIGINT) AS begin_char,
       |  CAST(len(cw) AS BIGINT) AS n_words,
       |  array_to_string(cw, ' ') AS chunk_text
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin
  }

  /** Quota-sample mirror (TextOps.quotaSample): the splitmix chain
    * over doc_id xor QuotaSeed, ranked per lang by the SIGNED
    * two's-complement view of the hash (Spark orders the native
    * expression's Long), quota k kept.
    */
  val quotaSample: String = {
    val seedU = java.lang.Long.toUnsignedString(TextOps.QuotaSeed)
    val k = TextOps.QuotaK
    s"""WITH s0 AS (
       |  SELECT lang, doc_id,
       |         ${xor64("CAST(doc_id AS HUGEINT)", s"$seedU::HUGEINT")} AS x
       |  FROM documents),
       |${splitmixCtes("qs", "s0", "lang, doc_id")},
       |r AS (
       |  SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY ${sb("hk")} ASC, doc_id ASC) AS rn
       |  FROM qs6)
       |SELECT lang, doc_id, CAST(rn AS BIGINT) AS smp_rank
       |FROM r WHERE rn <= $k ORDER BY lang, doc_id""".stripMargin
  }

  /** Embedding-decontamination mirror (VectorOps.decontaminateEmbed):
    * eval slice, double-fold cosine, micro floor, threshold, then the
    * per-doc argmax replayed as max over (sim, -eval_id) — the same
    * struct-max rule the Spark aggregate uses. Constants embedded
    * from the ONE Scala pair (DecontamEvalEvery/DecontamMinSimMicro).
    */
  val decontaminateEmbed: String = {
    val every = VectorOps.DecontamEvalEvery
    val minSim = VectorOps.DecontamMinSimMicro
    s"""WITH normed AS (
       |  SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings),
       |ev AS (SELECT vec_id AS eval_id, embedding AS e_emb, norm AS e_norm
       |       FROM normed WHERE vec_id % $every = 0),
       |scored AS (
       |  SELECT n.vec_id, ev.eval_id,
       |    CAST(floor(${dotSql("n.embedding", "ev.e_emb")} / (n.norm * ev.e_norm) * 1000000.0) AS BIGINT) AS sim_micro
       |  FROM normed n, ev),
       |hits AS (SELECT * FROM scored WHERE sim_micro >= $minSim)
       |SELECT CAST(vec_id AS BIGINT) AS vec_id,
       |  CAST(count(*) AS BIGINT) AS n_hits,
       |  CAST(max(sim_micro) AS BIGINT) AS max_sim_micro,
       |  CAST(min(CASE WHEN sim_micro = m THEN eval_id END) AS BIGINT) AS top_eval_id
       |FROM (SELECT vec_id, eval_id, sim_micro,
       |        max(sim_micro) OVER (PARTITION BY vec_id) AS m
       |      FROM hits) h
       |GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  /** Domain-mixture mirror (TextOps.mixDomains over labelProp
    * labels): the alpha = 1/2 temperature chain re-keyed from lang to
    * PROPAGATED host labels — embeds the label_prop CTE loop (passed
    * in from SparkEntry.labelPropCtes so the two rows share ONE
    * generated loop), maps every doc to its host's final label via
    * the host-id arithmetic, and replays the isqrt rate + splitmix
    * admission census per label stratum with the dedicated DomSeed.
    */
  def mixDomains(labelCtes: String, iters: Int): String = {
    val seedU = java.lang.Long.toUnsignedString(TextOps.DomSeed)
    val isq = TextOps.isqrtSql("n_docs")
    s"""WITH $labelCtes,
       |dl AS (
       |  SELECT dd.doc_id, l.label
       |  FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id, ${hidOfSql("doc_id")} AS hid
       |        FROM documents) dd
       |  JOIN l$iters l USING (hid)),
       |counts AS (SELECT label, count(*) AS n_docs FROM dl GROUP BY label),
       |rates AS (
       |  SELECT label, n_docs,
       |    least(1000, ((sum(n_docs) OVER ()) // 2) * 1000 * $isq
       |                // ((sum($isq) OVER ()) * n_docs)) AS rate_permille
       |  FROM counts),
       |s0d AS (SELECT dl.doc_id, dl.label,
       |        ${xor64("CAST(dl.doc_id AS HUGEINT)", s"$seedU::HUGEINT")} AS x
       |        FROM dl),
       |${splitmixCtes("md", "s0d", "doc_id, label")},
       |kept AS (
       |  SELECT s.label, count(*) AS n_kept
       |  FROM md6 s JOIN rates r USING (label)
       |  WHERE s.hk % 1000 < r.rate_permille GROUP BY s.label)
       |SELECT r.label, CAST(r.n_docs AS BIGINT) AS n_docs,
       |  CAST(r.rate_permille AS BIGINT) AS rate_permille,
       |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
       |FROM rates r LEFT JOIN kept k USING (label) ORDER BY r.label""".stripMargin
  }

  /** SemDeDup mirror (VectorOps.semDedup over the planted
    * corpusWithSemDups): the SHARED kmeansAssignCtes chain re-keyed to
    * the planted corpus CTE, per-cluster size cap, within-cluster
    * x<y pairs, double-fold cosine with micro floor, per-victim
    * argmax replayed as max-window + min-id (the decontaminateEmbed
    * struct-max rule), -1 sentinels for kept vectors. Constants from
    * the ONE Scala source (SemDupEvery/SemDupCopyShift/
    * SemDedupMinSimMicro/SemDedupMaxCluster) — a k-means change hits
    * this row along with the ivf/pq/recall/serve rows.
    */
  val semDedup: String = {
    val minSim = VectorOps.SemDedupMinSimMicro
    val cap = VectorOps.SemDedupMaxCluster
    val every = VectorOps.SemDupEvery
    val shift = VectorOps.SemDupCopyShift
    s"""WITH scorpus AS (
       |  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + $shift AS vec_id, embedding FROM embeddings WHERE vec_id % $every = 0),
       |${kmeansAssignCtes(16, 3, "scorpus")},
       |csz AS (SELECT cid, count(*) AS n FROM assigned GROUP BY cid),
       |cpd AS (SELECT a.vec_id, a.cid FROM assigned a JOIN csz USING (cid) WHERE csz.n <= $cap),
       |prs AS (
       |  SELECT x.vec_id AS keep_id, y.vec_id AS vec_id
       |  FROM cpd x JOIN cpd y ON x.cid = y.cid AND x.vec_id < y.vec_id),
       |nq AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM scorpus),
       |sc AS (
       |  SELECT p.vec_id, p.keep_id,
       |    CAST(floor(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) * 1000000.0) AS BIGINT) AS sim_micro
       |  FROM prs p JOIN nq a ON a.vec_id = p.keep_id JOIN nq b ON b.vec_id = p.vec_id),
       |hits AS (SELECT * FROM sc WHERE sim_micro >= $minSim),
       |best AS (
       |  SELECT vec_id, CAST(max(sim_micro) AS BIGINT) AS s,
       |    CAST(min(CASE WHEN sim_micro = m THEN keep_id END) AS BIGINT) AS d
       |  FROM (SELECT vec_id, keep_id, sim_micro,
       |          max(sim_micro) OVER (PARTITION BY vec_id) AS m FROM hits) h
       |  GROUP BY vec_id)
       |SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cell,
       |  CAST(COALESCE(b.d, -1) AS BIGINT) AS dup_of,
       |  CAST(COALESCE(b.s, -1) AS BIGINT) AS sim_micro
       |FROM assigned a LEFT JOIN best b USING (vec_id)
       |ORDER BY a.vec_id""".stripMargin
  }
}
