"""Corpus-curation declared queries: Gopher-style repetition/quality
signals, PII redaction, and domain-mixture resampling — the filter
stages a training-data pipeline runs between raw ingest and the
dedup/sampling stages already declared (queries/dedup.py,
queries/sampling.py).

The reference has no text surface at all (vectors only,
``src/hnsw.zig:12-16``); this pack belongs to the LLM-data-pipeline
surface the engine adds on top.

Scale posture (all three queries):

- Every per-document signal is computed by built-in expressions /
  higher-order functions inside whole-stage codegen — zero Python
  UDFs, zero explode-shuffles for the doc-level stats (the
  max-term-run is an ``aggregate`` HOF over the *sorted* token array,
  not an explode -> groupBy -> join-back, so the per-doc pass is
  shuffle-free).
- The only shuffles are the final tiny group-bys ((lang) or (domain)
  carrying integer partials) and, in the mixture query, one broadcast
  join of a #domains-row rate table back onto the scan.
- Every keep/redact decision is INTEGER arithmetic (cross-multiplied
  per-mille thresholds, md5-derived hashes) so the kept SET — pinned
  by id-sum checksums — is bit-identical across engines, partition
  layouts, and cluster sizes. The only floats are round()-ed
  corpus-level ratios derived from exact integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zvdb_spark.queries.registry import register
from zvdb_spark.queries.text import H_DUCK, H_SPARK, checksum_sum
from zvdb_spark.sources.tables import load

# --- quality gate thresholds (per-mille, integer cross-multiplied) ---
MIN_TOK, MAX_TOK = 20, 95  # token-count band
TOP_TOK_PM = 120  # keep iff top_term_count * 1000 <= 120 * n_tokens
DUP_BIGRAM_PM = 50  # keep iff dup_bigrams * 1000 <= 50 * (n_tokens-1)

# --- PII patterns (shared literal: Python-side for Spark, embedded in
# the DuckDB SQL — both engines treat them as the same regex; the
# subset used — char classes, +, {n} — is semantics-identical between
# Java regex and RE2) ---
PAT_EMAIL = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
PAT_PHONE = "555-[0-9]{4}"
PAT_IP = "10\\.[0-9]+\\.[0-9]+\\.[0-9]+"

# --- domain-mixture targets (per-mille, must sum to 1000) ---
MIX_TARGETS_PM: dict[str, int] = {
    "web": 450,
    "books": 300,
    "code": 175,
    "reference": 75,
}
RATE_M = 10_000  # sampling-rate resolution: hash % M < thr

_H_ID_SPARK = H_SPARK.format(x="cast(doc_id as string)")
_H_ID_DUCK = H_DUCK.format(x="doc_id::VARCHAR")

# Max term multiplicity without an explode: max run length over the
# sorted token array. One pass, struct accumulator, codegen-friendly;
# the DuckDB oracle proves the same number via unnest+groupBy.
_TOP_RUN = """
aggregate(
  array_sort(toks),
  named_struct('prev', '', 'run', 0L, 'best', 0L),
  (a, x) -> named_struct(
    'prev', x,
    'run', IF(x = a.prev, a.run + 1L, 1L),
    'best', greatest(a.best, IF(x = a.prev, a.run + 1L, 1L))),
  a -> a.best)
"""

# Distinct adjacent bigrams, zero-shuffle: zip the token array with
# itself shifted by one. (slice is 1-indexed; empty when n = 1.)
_ND2 = """
size(array_distinct(zip_with(
  slice(toks, 1, size(toks) - 1),
  slice(toks, 2, size(toks) - 1),
  (a, b) -> concat(a, ' ', b))))
"""

QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
),
s AS (
  SELECT doc_id, lang,
         len(toks) AS n,
         len(list_distinct(toks)) AS nd,
         len(list_distinct(
           [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]
         )) AS nd2
  FROM t
),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
c AS (SELECT doc_id, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
m AS (SELECT doc_id, max(cnt) AS top_n FROM c GROUP BY 1),
j AS (
  SELECT s.*, m.top_n,
         (n BETWEEN {MIN_TOK} AND {MAX_TOK}
          AND top_n * 1000 <= {TOP_TOK_PM} * n
          AND (n - 1 - nd2) * 1000 <= {DUP_BIGRAM_PM} * (n - 1)) AS keep
  FROM s JOIN m USING (doc_id)
)
SELECT lang,
       count(*) AS n_docs,
       count(*) FILTER (WHERE keep) AS n_kept,
       coalesce(sum(doc_id) FILTER (WHERE keep), 0) AS kept_id_sum,
       round(1 - sum(nd)::DOUBLE / sum(n), 4) AS dup_tok_frac,
       round(sum(top_n)::DOUBLE / sum(n), 4) AS top_tok_frac,
       round((sum(n - 1) - sum(nd2))::DOUBLE / sum(n - 1), 4)
         AS dup_bigram_frac
FROM j GROUP BY lang
"""


@register(
    "q_quality_signals",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_curation_queries.py against QUALITY_ORACLE
    tags=("curation", "text", "pipeline"),
)
def q_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality gate: per-doc token count,
    distinct-token count, distinct-adjacent-bigram count, and max
    term multiplicity — all via array HOFs over one projection (the
    max-run trick replaces explode -> groupBy -> join-back, so the
    per-doc pass never shuffles) — then an integer-exact keep verdict
    (token band + top-token <=12% + duplicate-bigrams <=5%) rolled up
    per language with the kept set pinned by its id-sum checksum."""
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            "lang",
            F.expr("size(toks)").alias("n"),
            F.expr("size(array_distinct(toks))").alias("nd"),
            F.expr(_ND2).alias("nd2"),
            F.expr(_TOP_RUN).alias("top_n"),
        )
    )
    keep = (
        F.col("n").between(MIN_TOK, MAX_TOK)
        & (F.col("top_n") * 1000 <= TOP_TOK_PM * F.col("n"))
        & ((F.col("n") - 1 - F.col("nd2")) * 1000
           <= DUP_BIGRAM_PM * (F.col("n") - 1))
    )
    agg = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(keep, 1)).alias("n_kept"),
        F.coalesce(F.sum(F.when(keep, F.col("doc_id"))), F.lit(0))
        .alias("kept_id_sum"),
        F.sum("n").alias("sum_n"),
        F.sum("nd").alias("sum_nd"),
        F.sum("nd2").alias("sum_nd2"),
        F.sum(F.col("n") - 1).alias("sum_n1"),
        F.sum("top_n").alias("sum_top"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_kept",
        "kept_id_sum",
        F.round(
            F.lit(1.0) - F.col("sum_nd") / F.col("sum_n"), 4
        ).alias("dup_tok_frac"),
        F.round(F.col("sum_top") / F.col("sum_n"), 4).alias("top_tok_frac"),
        F.round(
            (F.col("sum_n1") - F.col("sum_nd2")) / F.col("sum_n1"), 4
        ).alias("dup_bigram_frac"),
    )


# Deterministic PII salt: the corpus itself is PII-free, so the query
# injects synthetic identifiers derived from doc_id (email always;
# phone on doc_id%3==0; IPv4 on doc_id%5==0) and then proves the
# scrubber removes every one of them. The injection is part of the
# declared contract — counts, the zero-residual invariant, and the
# scrubbed-text checksum are all deterministic functions of the input.
_SALT_DUCK = (
    "text || ' user' || doc_id::VARCHAR || '@mail' || "
    "(doc_id % 7)::VARCHAR || '.com'"
    " || CASE WHEN doc_id % 3 = 0 THEN ' 555-' || "
    "lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' 10.0.' || "
    "(doc_id % 200)::VARCHAR || '.' || "
    "((doc_id * 7) % 250 + 1)::VARCHAR ELSE '' END"
)

PII_ORACLE = f"""
WITH s AS (
  SELECT doc_id, lang, {_SALT_DUCK} AS salted FROM documents
),
r AS (
  SELECT doc_id, lang, salted,
         regexp_replace(
           regexp_replace(
             regexp_replace(salted, '{PAT_EMAIL}', '<EMAIL>', 'g'),
             '{PAT_PHONE}', '<PHONE>', 'g'),
           '{PAT_IP}', '<IP>', 'g') AS clean
  FROM s
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(salted, '{PAT_EMAIL}'))) AS BIGINT)
         AS emails,
       CAST(sum(len(regexp_extract_all(salted, '{PAT_PHONE}'))) AS BIGINT)
         AS phones,
       CAST(sum(len(regexp_extract_all(salted, '{PAT_IP}'))) AS BIGINT)
         AS ips,
       count(*) FILTER (WHERE regexp_matches(clean, '{PAT_EMAIL}')
                           OR regexp_matches(clean, '{PAT_PHONE}')
                           OR regexp_matches(clean, '{PAT_IP}'))
         AS residual_pii,
       CAST(sum({H_DUCK.format(x="clean")}) AS VARCHAR) AS clean_checksum
FROM r GROUP BY lang
"""


@register(
    "q_pii_redact",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_curation_queries.py against PII_ORACLE
    tags=("curation", "text", "pipeline"),
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: inject deterministic synthetic identifiers (email /
    phone / IPv4, derived from doc_id), count them with
    regexp_extract_all, scrub with chained regexp_replace, and prove
    removal — residual_pii must be 0 and the scrubbed text is pinned
    by a portable md5 checksum. Pure JVM regex work in one projection;
    the only shuffle is the per-lang rollup of integer partials."""
    did = F.col("doc_id")
    salt = F.concat(
        F.col("text"),
        F.lit(" user"), did.cast("string"),
        F.lit("@mail"), (did % 7).cast("string"), F.lit(".com"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" 555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" 10.0."), (did % 200).cast("string"),
                F.lit("."), ((did * 7) % 250 + 1).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", salt.alias("salted"))
        .withColumn(
            "clean",
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.col("salted"), PAT_EMAIL, "<EMAIL>"),
                    PAT_PHONE, "<PHONE>",
                ),
                PAT_IP, "<IP>",
            ),
        )
    )
    n_matches = lambda c, p: F.size(F.regexp_extract_all(c, F.lit(p), 0))  # noqa: E731
    residual = (
        F.col("clean").rlike(PAT_EMAIL)
        | F.col("clean").rlike(PAT_PHONE)
        | F.col("clean").rlike(PAT_IP)
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_matches(F.col("salted"), PAT_EMAIL)).alias("emails"),
        F.sum(n_matches(F.col("salted"), PAT_PHONE)).alias("phones"),
        F.sum(n_matches(F.col("salted"), PAT_IP)).alias("ips"),
        F.count(F.when(residual, 1)).alias("residual_pii"),
        checksum_sum("clean").cast("string").alias("clean_checksum"),
    )


# --- statistical-LM novelty filter (CCNet-style, integer-exact) ---
NOVELTY_PM = 400  # keep iff novel trigrams <= 40% of the doc's trigrams

# greatest(.., 0): slice() rejects negative lengths, so docs with
# < 3 tokens must resolve to an empty trigram list, not an error
_TRIGRAMS = """
zip_with(
  slice(toks, 1, greatest(size(toks) - 2, 0)),
  zip_with(
    slice(toks, 2, greatest(size(toks) - 2, 0)),
    slice(toks, 3, greatest(size(toks) - 2, 0)),
    (b, c) -> concat(b, ' ', c)),
  (a, bc) -> concat(a, ' ', bc))
"""

LM_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
),
tri AS (
  SELECT doc_id, lang,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS tg
  FROM t, unnest(range(1, len(toks) - 1)) u(i)
),
c AS (
  SELECT doc_id, lang,
         count(*) OVER (PARTITION BY {H_DUCK.format(x="tg")}) AS cnt
  FROM tri
),
d AS (
  SELECT doc_id, lang, count(*) AS n_tri,
         count(*) FILTER (WHERE cnt = 1) AS n_novel
  FROM c GROUP BY 1, 2
)
SELECT lang,
       count(*) AS n_docs,
       count(*) FILTER (WHERE n_novel * 1000 <= {NOVELTY_PM} * n_tri)
         AS n_kept,
       coalesce(sum(doc_id)
           FILTER (WHERE n_novel * 1000 <= {NOVELTY_PM} * n_tri), 0)
         AS kept_id_sum,
       CAST(sum(n_tri) AS BIGINT) AS tri_total,
       CAST(sum(n_novel) AS BIGINT) AS tri_novel,
       CAST(sum(n_novel) * 1000 // sum(n_tri) AS BIGINT) AS novelty_pm
FROM d GROUP BY lang
"""


@register(
    "q_lm_filter",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_curation_queries.py against LM_ORACLE
    tags=("curation", "text", "pipeline"),
)
def q_lm_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-LM quality filter (the CCNet perplexity-filter
    stage — Wenzek et al. 2020, arXiv:1911.00359 — as an
    integer-exact proxy): a document's novelty is the fraction of its
    trigrams with ZERO other occurrences corpus-wide (leave-one-out
    "unseen by the LM"), and a doc is kept iff novelty clears the
    per-mille threshold. Proxy instead of a real KenLM score because
    the verdict must be bit-identical cross-engine: counts and
    cross-multiplied thresholds are exact where log-prob sums are
    float-order-dependent; the mechanism (n-gram statistics from the
    corpus judging each doc) is the same.

    Scale posture — same shape as q_dedup_spans: trigrams are one
    zip_with projection (no per-token explode before the generator),
    the corpus count is a window over the trigram's portable 60-bit
    hash (ONE shuffle, no join back, no broadcast-size assumption),
    then a doc_id agg and a tiny lang rollup. Docs with < 3 tokens
    have no trigrams and are excluded (both engines identically)."""
    tri = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.split("text", " ").alias("toks"))
        .select(
            "doc_id", "lang", F.explode(F.expr(_TRIGRAMS)).alias("tg")
        )
        .withColumn("tg_h", F.expr(H_SPARK.format(x="tg")))
    )
    from pyspark.sql import Window as W

    cnt = tri.withColumn(
        "cnt", F.count("*").over(W.partitionBy("tg_h"))
    )
    d = cnt.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_tri"),
        F.count(F.when(F.col("cnt") == 1, 1)).alias("n_novel"),
    )
    keep = F.col("n_novel") * 1000 <= NOVELTY_PM * F.col("n_tri")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(keep, 1)).alias("n_kept"),
        F.coalesce(F.sum(F.when(keep, F.col("doc_id"))), F.lit(0)).alias(
            "kept_id_sum"
        ),
        F.sum("n_tri").alias("tri_total"),
        F.sum("n_novel").alias("tri_novel"),
        F.expr("sum(n_novel) * 1000 div sum(n_tri)").alias("novelty_pm"),
    )


def _domain_case_duck() -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{name}'"
        for i, name in enumerate(MIX_TARGETS_PM)
    )
    # fail fast on fixture drift: an unmapped source value must error,
    # not silently fall out of the mixture via a NULL join key
    return (
        f"CASE (substr(source, 4)::INT % 4) {whens} "
        "ELSE error('q_domain_mixture: unmapped source ' || source) END"
    )


def _target_case_duck() -> str:
    whens = " ".join(
        f"WHEN '{name}' THEN {pm}" for name, pm in MIX_TARGETS_PM.items()
    )
    return f"CASE domain {whens} END"


def _domain_col_spark():
    m = F.expr("cast(substring(source, 4) as int) % 4")
    c = None
    for i, name in enumerate(MIX_TARGETS_PM):
        c = F.when(m == i, name) if c is None else c.when(m == i, name)
    # fail fast on fixture drift (Spark's non-ANSI cast turns a
    # non-numeric suffix into NULL, which would otherwise silently
    # drop the doc from the mixture via a NULL join key)
    return c.otherwise(
        F.raise_error(
            F.concat(F.lit("q_domain_mixture: unmapped source "), F.col("source"))
        )
    )


def _target_col_spark():
    c = None
    for name, pm in MIX_TARGETS_PM.items():
        cond = F.col("domain") == name
        c = F.when(cond, pm) if c is None else c.when(cond, pm)
    return c


MIXTURE_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         {_domain_case_duck()} AS domain,
         {_H_ID_DUCK} % {RATE_M} AS h
  FROM documents
),
c AS (SELECT domain, count(*) AS n_total FROM d GROUP BY 1),
ct AS (SELECT domain, n_total, {_target_case_duck()} AS t_pm FROM c),
tc AS (SELECT min(n_total * 1000 // t_pm) AS t_cap FROM ct),
r AS (
  SELECT domain, n_total,
         (t_pm * t_cap * {RATE_M}) // (1000 * n_total) AS thr
  FROM ct, tc
)
SELECT r.domain, r.n_total, r.thr,
       count(*) FILTER (WHERE h < thr) AS n_kept,
       coalesce(sum(doc_id) FILTER (WHERE h < thr), 0) AS kept_id_sum
FROM d JOIN r USING (domain)
GROUP BY 1, 2, 3
"""


@register(
    "q_domain_mixture",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_curation_queries.py against MIXTURE_ORACLE
    tags=("curation", "sampling", "pipeline"),
)
def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling: given target per-mille proportions
    over source domains, find the largest total sample T every domain
    can supply (T = min_d n_d*1000/t_d), derive each domain's integer
    acceptance threshold, and keep a doc iff its portable hash clears
    it. Two tiny aggregations plus ONE broadcast join of the
    #domains-row rate table back onto the scan — changing the mixture
    re-evaluates one predicate, never a per-domain count-and-shuffle
    pass. All-integer thresholds (cross-multiplied per-mille, `div`)
    keep the kept set bit-identical across engines; int64 is ample
    headroom here (t_pm*T*M <= 1e19 only past ~1e12 docs/domain —
    switch thr math to DECIMAL at that scale)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        _domain_col_spark().alias("domain"),
        (F.expr(_H_ID_SPARK) % RATE_M).alias("h"),
    )
    counts = d.groupBy("domain").agg(F.count("*").alias("n_total"))
    ct = counts.withColumn("t_pm", _target_col_spark())
    t_cap = ct.agg(
        F.min(F.expr("n_total * 1000 div t_pm")).alias("t_cap")
    )
    rates = ct.crossJoin(F.broadcast(t_cap)).withColumn(
        "thr", F.expr(f"(t_pm * t_cap * {RATE_M}) div (1000 * n_total)")
    )
    kept = F.col("h") < F.col("thr")
    return (
        d.join(F.broadcast(rates), "domain")
        .groupBy("domain", "n_total", "thr")
        .agg(
            F.count(F.when(kept, 1)).alias("n_kept"),
            F.coalesce(F.sum(F.when(kept, F.col("doc_id"))), F.lit(0))
            .alias("kept_id_sum"),
        )
        .select("domain", "n_total", "thr", "n_kept", "kept_id_sum")
    )
