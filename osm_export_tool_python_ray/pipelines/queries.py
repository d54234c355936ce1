"""Driver-contract query implementations (one per operator family from
SURVEY.md §2 + the training-data ops) with matching DuckDB oracle SQL.

Every SQL-expressible query names its computed columns identically in the
Ray pipeline and the oracle (the driver sorts columns by name and
value-hashes). Floating-point aggregates are rounded to 6 decimals on BOTH
sides so double-summation order cannot flip the hash; rank/selection ties
are broken on a quantized key + id on both sides (raw doubles differ in
the last ulp between numpy and DuckDB). ALL queries in QUERIES are oracle-backed
— including the LSH families (MinHash/SimHash re-derived with exact hash
arithmetic in SQL), connected components (recursive CTE), the full export
surface (span-UNNEST re-derivation), deterministic strided-centroid
ivf_topk / embedding_kmeans (centroids re-derived by rank+join in SQL),
and media_features (expected decoded header re-derived from md5(ref)
seed arithmetic); pytest additionally carries brute-force/recall/codec
verification for the model-shaped ones.
"""

import os
import zlib

import numpy as np
from osm_export_tool_python_ray.state.broadcast import cached_get
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from osm_export_tool_python_ray.functions.cells import cell_of
from osm_export_tool_python_ray.functions.quantize import (
    qround,
    qround6,
    sql_qfloor,
    sql_qround,
    sql_qround6,
)
from osm_export_tool_python_ray.functions.tiles import lonlat_to_tile

_CORPUS_CACHE = "/tmp/graft_corpus"


def _read(sf_dir, table, columns=None):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, table + ".parquet"), columns=columns
    )


def corpus_path(n_shards, density=1.0):
    """Deterministic cached corpus parquet (generated once per config).
    Large corpora are generated in parallel with Ray (one task per shard
    range — generation is a pure function of shard id)."""
    os.makedirs(_CORPUS_CACHE, exist_ok=True)
    path = os.path.join(_CORPUS_CACHE, "corpus_s%d_d%g.parquet" % (n_shards, density))
    if not os.path.exists(path):
        tmp = path + ".tmp"
        if n_shards >= 32:
            import shutil

            from osm_export_tool_python_ray.sources.corpus import corpus_dataset

            if os.path.isdir(tmp):
                shutil.rmtree(tmp)
            corpus_dataset(n_shards, density=density).write_parquet(tmp)
        else:
            from osm_export_tool_python_ray.sources.corpus import write_corpus_parquet

            write_corpus_parquet(tmp, n_shards=n_shards, density=density)
        os.replace(tmp, path)
    return path


# ---------------------------------------------------------------- documents

def q_exact_dedup(sf_dir):
    from osm_export_tool_python_ray.stages.dedup import exact_dedup

    return exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]), num_buckets=16)


SQL_EXACT_DEDUP = """
SELECT min(doc_id) AS doc_id, count(*) AS n_dups
FROM documents GROUP BY md5(text)
"""


def q_bloom_incremental(sf_dir):
    """Cross-snapshot incremental dedup: the held-out 'new shard'
    (doc_id % 3 == 0) probed against a broadcast Bloom filter built over
    the 'base corpus' (doc_id % 3 != 0) — zero shuffle on either side
    (stages/bloom.py: per-batch partial bitsets, Dataset tree fold,
    ray.put broadcast probe). The md5-seeded double-hash family is fully
    deterministic, so the oracle re-derives the EXACT flag set —
    false positives included — with the same HUGEINT arithmetic."""
    from osm_export_tool_python_ray.stages.bloom import bloom_probe, build_bloom

    def split(keep_new):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % 3 == 0) if keep_new else (ids % 3 != 0)
            return t.filter(pa.array(m))

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            fn, batch_format="pyarrow"
        )

    bits = build_bloom(split(False))
    return bloom_probe(split(True), bits).sort("doc_id")


def _build_bloom_sql(m_bits=1 << 20, k=4):
    """(h1 + i*h2) mod 2^64 mod m in DuckDB: h1/h2 = LE u64 of md5(text)
    bytes [0:8)/[8:16); the wrap multiply via _sql_mulmod64, the wrap
    add in HUGEINT. bool_and over the k positions = the ALL-bits-set
    probe."""
    h1 = _le64_expr("hh")
    h2 = _le64_expr("substr(hh, 17, 16)")
    ih2 = _sql_mulmod64("CAST(i AS UBIGINT)", h2)
    pos = (
        "CAST(((CAST({h1} AS HUGEINT) + CAST({ih2} AS HUGEINT))"
        " % CAST('18446744073709551616' AS HUGEINT)) % {m} AS BIGINT)"
    ).format(h1=h1, ih2=ih2, m=m_bits)
    return """
WITH base AS (SELECT DISTINCT md5(text) AS hh FROM documents WHERE doc_id % 3 <> 0),
apos AS (SELECT DISTINCT {pos} AS p FROM base, range({k}) r(i)),
newdocs AS (SELECT doc_id, md5(text) AS hh FROM documents WHERE doc_id % 3 = 0),
bpos AS (SELECT doc_id, {pos} AS p FROM newdocs, range({k}) r(i))
SELECT doc_id, bool_and(p IN (SELECT p FROM apos)) AS bloom_hit
FROM bpos GROUP BY doc_id
""".format(pos=pos, k=k)


# SQL_BLOOM_INCREMENTAL is assigned after _le64_expr/_sql_mulmod64 are
# defined (module bottom, next to the ORACLES registry).


def q_token_budget(sf_dir):
    from osm_export_tool_python_ray.stages.textstages import token_budget

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(token_budget, batch_format="pyarrow")


def _build_token_budget_sql():
    """The engine's BPE_TOKEN_PATTERN is restricted to the RE2 subset
    (no lookahead, explicit [\\t\\n\\f\\r ] whitespace classes) precisely
    so the oracle can count the same segments with regexp_extract_all —
    leftmost-first alternation in both engines. The pattern is
    interpolated from the Python constant so the two sides cannot
    drift."""
    from osm_export_tool_python_ray.functions.text import BPE_TOKEN_PATTERN

    return r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '%s')) AS n_bpe_tokens
FROM documents
""" % BPE_TOKEN_PATTERN.replace("'", "''")


SQL_TOKEN_BUDGET = _build_token_budget_sql()


def q_doc_stats(sf_dir):
    from osm_export_tool_python_ray.stages.textstages import doc_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(doc_stats, batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("punct_ratio"),
            "punct_ratio",
            pc.round(t.column("punct_ratio"), 6),
        ).set_column(
            t.schema.get_field_index("mean_token_len"),
            "mean_token_len",
            pc.round(t.column("mean_token_len"), 6),
        ),
        batch_format="pyarrow",
    )


SQL_DOC_STATS = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+')) AS n_tokens,
       length(text) AS n_chars_calc,
       round(CASE WHEN length(text) > 0
             THEN len(regexp_extract_all(text, '[.!?,;:]')) * 1.0 / length(text)
             ELSE 0 END, 6) AS punct_ratio,
       round(CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
             THEN (length(text) - greatest(len(regexp_extract_all(text, '\S+')) - 1, 0)) * 1.0
                  / len(regexp_extract_all(text, '\S+'))
             ELSE 0 END, 6) AS mean_token_len
FROM documents
"""


def q_doc_fingerprint(sf_dir):
    from osm_export_tool_python_ray.stages.textstages import doc_fingerprint

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        doc_fingerprint, batch_format="pyarrow"
    )


SQL_DOC_FINGERPRINT = r"""
SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
FROM documents
"""


def q_quality_score(sf_dir):
    from osm_export_tool_python_ray.stages.textstages import quality_score

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        quality_score, batch_format="pyarrow"
    )
    return ds.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("quality"), "quality", pc.round(t.column("quality"), 6)
        ),
        batch_format="pyarrow",
    )


SQL_QUALITY_SCORE = r"""
WITH s AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+')) AS toks,
         length(text) AS chars,
         len(regexp_extract_all(text, '[.!?,;:]')) AS punct
  FROM documents
), d AS (
  SELECT doc_id, toks,
         CASE WHEN chars > 0 THEN punct * 1.0 / chars ELSE 0 END AS pr,
         CASE WHEN toks > 0 THEN (chars - greatest(toks - 1, 0)) * 1.0 / toks ELSE 0 END AS mtl
  FROM s
)
SELECT doc_id,
       round(0.4 * (CASE WHEN toks >= 5 AND toks <= 100000 THEN 1.0 ELSE 0.0 END)
           + 0.3 * (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)
           + 0.3 * (CASE WHEN mtl >= 2.0 AND mtl <= 15.0 THEN 1.0 ELSE 0.0 END), 6) AS quality
FROM d
"""


def q_repetition_quality(sf_dir):
    """Gopher-style within-document repetition filters (integer-exact:
    every output column is a count or an integer-cross-product boolean,
    so the oracle carries no float rounding hazard)."""
    from osm_export_tool_python_ray.stages.textstages import repetition_quality

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        repetition_quality, batch_format="pyarrow"
    )


SQL_REPETITION_QUALITY = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
),
wc AS (
  SELECT doc_id, len(t) AS n_words, len(list_distinct(t)) AS n_uniq FROM toks
),
bg AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
  FROM toks, UNNEST(range(1, len(t))) r(i)
),
bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
bgm AS (SELECT doc_id, max(c) AS mx FROM bgc GROUP BY doc_id)
SELECT w.doc_id, w.n_words, w.n_uniq,
       coalesce(m.mx, 0) AS top_bigram_count,
       greatest(w.n_words - 1, 0) AS n_bigrams,
       (10 * w.n_uniq) < (7 * w.n_words) AS high_repetition
FROM wc w LEFT JOIN bgm m USING (doc_id)
"""


def q_vocab_topk(sf_dir):
    """Corpus vocabulary: top-100 terms by document frequency with tf and
    idf. Per-batch combiner (stages/textstages.py vocab_partial) collapses
    the token stream to |vocab| partial rows BEFORE the groupby, so the
    all-to-all moves vocabulary rows, not tokens; the final sort runs over
    |vocab| rows only. Ties at the cut rank break by term (both sides)."""
    from osm_export_tool_python_ray.stages.textstages import vocab_partial

    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()

    def finish(t: pa.Table) -> pa.Table:
        df = t.column("sum(df)")
        idf = pa.array(
            qround6(
                np.log((n_docs + 1) / (np.asarray(df).astype(np.float64) + 1.0)),
                "vocab_idf",
            )
        )
        return pa.table(
            {
                "term": t.column("term"),
                "df": df,
                "tf": t.column("sum(tf)"),
                "idf": idf,
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(vocab_partial, batch_format="pyarrow")
        .groupby("term")
        .sum(["df", "tf"])
        .map_batches(finish, batch_format="pyarrow")
        .sort(["df", "term"], descending=[True, False])
        .limit(100)
    )


SQL_VOCAB_TOPK = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
),
w AS (SELECT doc_id, unnest(t) AS term FROM toks),
agg AS (SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf FROM w GROUP BY term)
SELECT term, df, tf,
       {QR_IDF} AS idf
FROM agg ORDER BY df DESC, term LIMIT 100
""".format(
    QR_IDF=sql_qround6(
        "ln(((SELECT count(*) FROM documents) + 1) / (df + 1.0))"
    )
)


def q_postings(sf_dir):
    """Inverted-index build (stages/invindex.py build_postings): per
    (term, doc) tf and 1-based first occurrence position from a map-side
    fold, document frequency attached in the ONE term-keyed exchange
    that term-sorts the posting lists."""
    from osm_export_tool_python_ray.stages.invindex import build_postings

    return build_postings(
        _read(sf_dir, "documents", ["doc_id", "text"])
    ).sort(["term", "doc_id"])


SQL_POSTINGS = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
w AS (
  SELECT doc_id, t[i] AS term, i
  FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)
),
pd AS (
  SELECT term, doc_id, count(*) AS tf, min(i) AS first_pos
  FROM w GROUP BY term, doc_id
)
SELECT term, doc_id, tf, first_pos,
       count(*) OVER (PARTITION BY term) AS df
FROM pd ORDER BY term, doc_id
"""


def q_unigram_logprob(sf_dir):
    """Perplexity-style quality scoring (CCNet/C4 family): per-doc mean
    unigram log-probability in integer MICRO-NATS under the corpus's own
    top-1000 vocabulary (out-of-vocabulary tokens get a 0.5 pseudo-count;
    per-token values quantized to int64 before the sum so the result is
    summation-order independent — repetition_quality's integer-exact
    oracle pattern). Two-pass broadcast
    shape: pass 1 is the vocab_topk combiner pipeline (the exchange moves
    |vocab| rows, not tokens) whose top-V table + corpus token total are
    broadcast via ray.put; pass 2 scores every batch map-side with a
    sorted-array searchsorted lookup — no second shuffle. The top-V cut is
    a DISTRIBUTED ``.sort().limit(V)`` over the grouped term table (the
    q_vocab_topk pattern) — at web scale the distinct-token table is
    itself huge (typos/numbers → 10⁸–10⁹ terms), so it must never reach
    the driver; the grouped table is materialized once as distributed
    blocks (it feeds both the token total and the top-V cut), and the only
    driver-side collect is the final V rows."""
    import ray

    from osm_export_tool_python_ray.functions.text import alnum_tokens_batch
    from osm_export_tool_python_ray.stages.textstages import vocab_partial

    V = 1000
    grouped = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(vocab_partial, batch_format="pyarrow")
        .groupby("term")
        .sum(["tf"])
        .materialize()  # |distinct terms| rows in distributed blocks, NOT on the driver
    )
    total = int(grouped.sum("sum(tf)") or 0)
    # top-V by (tf desc, term asc) — deterministic at the cut rank: ties
    # at rank V break lexicographically, on both the engine and SQL side
    top_rows = (
        grouped.sort(["sum(tf)", "term"], descending=[True, False])
        .limit(V)
        .take_all()
    )
    vterms = np.array([r["term"] for r in top_rows])
    vtf = np.array([r["sum(tf)"] for r in top_rows], dtype=np.int64)
    vorder = np.argsort(vterms)
    vocab_ref = ray.put((vterms[vorder], vtf[vorder], total))

    def score(t: pa.Table) -> pa.Table:
        vt, vc, tot = cached_get(vocab_ref)
        flat, ntoks = alnum_tokens_batch(t.column("text").to_pylist())
        if tot == 0 or not flat:
            lp_doc = np.zeros(len(ntoks), dtype=np.int64)
        else:
            w = np.array(flat)
            pos = np.searchsorted(vt, w)
            hit = (pos < len(vt)) & (vt[np.minimum(pos, len(vt) - 1)] == w)
            cnt = np.where(hit, vc[np.minimum(pos, len(vt) - 1)], 0.5)
            # per-token logprob quantized to int64 micro-nats FIRST: the
            # per-doc sum is then integer-exact and summation-ORDER
            # independent — a float mean here is a latent flake, because
            # DuckDB's parallel avg() sums in nondeterministic order and
            # can flip the 6th decimal at a rounding boundary between runs
            q = qround(np.log(cnt / tot) * 1e6, "unigram_lp")
            starts = np.concatenate(([0], np.cumsum(ntoks)[:-1]))
            # reduceat over NON-EMPTY segment starts only. Never "clip"
            # out-of-range starts of trailing empty docs to len(q)-1: that
            # makes the index list non-monotonic and reduceat then SKIPS
            # the final token of the last non-empty doc — a bug that only
            # fires when a batch ends with a zero-token doc (i.e. depends
            # on how Ray happened to slice the batch).
            nz = ntoks > 0
            sums = np.zeros(len(ntoks), dtype=np.int64)
            if nz.any():
                sums[nz] = np.add.reduceat(q, starts[nz])
            lp_doc = np.where(nz, sums // np.maximum(ntoks, 1), 0)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_alnum_tokens": pa.array(ntoks),
                "lp_micro": pa.array(lp_doc.astype(np.int64)),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


SQL_UNIGRAM_LOGPROB = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
),
w AS (SELECT doc_id, unnest(t) AS term FROM toks),
agg AS (SELECT term, count(*) AS tf FROM w GROUP BY term),
tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS total FROM agg),
topv AS (SELECT term, tf FROM agg ORDER BY tf DESC, term LIMIT 1000),
scored AS (
  -- per-token micro-nat quantization BEFORE the sum: integer-exact and
  -- summation-order independent (parallel float avg() is not)
  SELECT w.doc_id,
         {QR_LP} AS q
  FROM w LEFT JOIN topv USING (term)
),
al AS (
  -- exact integer FLOOR division (numpy // floors; DuckDB // truncates
  -- toward zero): HUGEINT truncating division corrected by one when the
  -- remainder is nonzero and the sum negative. Exact at ANY magnitude —
  -- no 2^53 double-precision bound.
  SELECT doc_id, count(*) AS n,
         CAST(sum(q) // count(*)
              - CASE WHEN sum(q) % count(*) <> 0 AND sum(q) < 0
                     THEN 1 ELSE 0 END AS BIGINT) AS m
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(al.n, 0) AS n_alnum_tokens,
       coalesce(al.m, 0) AS lp_micro
FROM documents d LEFT JOIN al USING (doc_id)
""".format(
    QR_LP=sql_qround(
        "ln(coalesce(CAST(topv.tf AS DOUBLE), 0.5)"
        " / (SELECT total FROM tot)) * 1e6"
    )
)


def q_decontaminate(sf_dir):
    """Benchmark n-gram-overlap decontamination: broadcast the held-out
    slice's distinct 5-gram keys, probe per batch — no shuffle on the
    corpus side (stages/decontam.py)."""
    from osm_export_tool_python_ray.stages.decontam import decontaminate

    return decontaminate(_read(sf_dir, "documents", ["doc_id", "text"]))


# Gram semantics mirror _NGRAM_PAIR_CTES with n=5 (lowered \S+ tokens,
# whole-doc gram for 1..4-token docs, DISTINCT per doc); the oracle joins
# gram STRINGS, so an engine u64 key collision would surface here.
SQL_DECONTAMINATE = r"""
WITH toks AS (
  SELECT doc_id, list_transform(regexp_extract_all(text, '\S+'), s -> lower(s)) AS tk
  FROM documents
),
grams_all AS (
  SELECT doc_id, array_to_string(tk[i:i+4], ' ') AS gram
  FROM toks, UNNEST(range(1, len(tk) - 3)) AS r(i)
  WHERE len(tk) >= 5
  UNION ALL
  SELECT doc_id, array_to_string(tk, ' ') AS gram FROM toks WHERE len(tk) BETWEEN 1 AND 4
),
gset AS (SELECT DISTINCT doc_id, gram FROM grams_all),
bench AS (SELECT DISTINCT gram FROM gset WHERE doc_id % 97 = 0),
hits AS (
  SELECT g.doc_id, count(*) AS n_overlap
  FROM gset g JOIN bench b ON b.gram = g.gram
  WHERE g.doc_id % 97 <> 0
  GROUP BY g.doc_id
)
SELECT d.doc_id, coalesce(h.n_overlap, 0) AS n_overlap,
       coalesce(h.n_overlap, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 97 <> 0
"""


def q_pii_redact(sf_dir):
    from osm_export_tool_python_ray.stages.textstages import pii_redact

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        pii_redact, batch_format="pyarrow"
    )


def _build_pii_redact_sql():
    """Patterns interpolated from the engine constants (RE2-restricted,
    no single quotes) so the two sides cannot drift; the md5 of the
    redacted text verifies the scrubbed BYTES, not just span counts."""
    from osm_export_tool_python_ray.stages.textstages import (
        PII_EMAIL_PATTERN,
        PII_PHONE_PATTERN,
    )

    return r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         '@mail.example.com or call +1-555-' ||
         lpad(CAST((doc_id * 7919) % 10000 AS VARCHAR), 4, '0') || ' now' AS a
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(a, '{em}')) AS n_emails,
       len(regexp_extract_all(a, '{ph}')) AS n_phones,
       md5(regexp_replace(regexp_replace(a, '{em}', '<EMAIL>', 'g'),
                          '{ph}', '<PHONE>', 'g')) AS red_md5
FROM aug
""".format(em=PII_EMAIL_PATTERN, ph=PII_PHONE_PATTERN)


SQL_PII_REDACT = _build_pii_redact_sql()


def q_hash_sample(sf_dir):
    from osm_export_tool_python_ray.stages.textstages import hash_sample

    return _read(sf_dir, "documents", ["doc_id", "lang", "source"]).map_batches(
        hash_sample, batch_format="pyarrow"
    )


def q_lang_counts(sf_dir):
    from ray.data.aggregate import Count

    return (
        _read(sf_dir, "documents", ["doc_id", "lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n"))
    )


SQL_LANG_COUNTS = "SELECT lang, count(*) AS n FROM documents GROUP BY lang"


def q_char_quantiles(sf_dir):
    """EXACT distributed quantiles over a bounded-domain column (doc
    length per language) — the histogram-combiner pattern: per-batch
    (lang, value) partial counts collapse the data to |langs|×|distinct
    values| rows BEFORE the one exchange, then each language group walks
    its cumulative histogram. No sample/sketch error, no sort of the raw
    data; at 100 TB the exchange moves only the histogram. Rank
    convention pinned to DuckDB quantile_disc: 1-indexed ceil(q*n) in
    C-double arithmetic (np.ceil(q*n) reproduces it bit-for-bit)."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map

    QS = [0.25, 0.5, 0.75, 0.95, 0.99]

    def partial(t: pa.Table) -> pa.Table:
        lang = t.column("lang").to_numpy(zero_copy_only=False)
        v = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        langs, inv = np.unique(lang, return_inverse=True)
        pair = inv.astype(np.int64) << np.int64(40) | v  # n_chars < 2^40
        upair, cnt = np.unique(pair, return_counts=True)
        li = (upair >> np.int64(40)).astype(np.int64)
        # bucket = stable hash of the lang VALUE (a batch-local unique
        # index would scatter one lang's histogram across buckets)
        from osm_export_tool_python_ray.stages.exchange import hash_bucket

        lang_bucket = hash_bucket(pa.array(langs, type=pa.string()), 8)
        return pa.table(
            {
                "lang": pa.array(langs[li], type=pa.string()),
                "value": pa.array(upair & np.int64((1 << 40) - 1)),
                "cnt": pa.array(cnt.astype(np.int64)),
                "bucket": pa.array(lang_bucket[li]),
            }
        )

    def quantiles(g: pa.Table) -> pa.Table:
        g = g.sort_by([("lang", "ascending"), ("value", "ascending")])
        lang = g.column("lang").to_numpy(zero_copy_only=False)
        val = g.column("value").to_numpy(zero_copy_only=False)
        cnt = g.column("cnt").to_numpy(zero_copy_only=False)
        out = {"lang": [], "n_docs": []}
        for q in QS:
            out["p%d" % int(q * 100)] = []
        starts = np.nonzero(
            np.concatenate(([True], lang[1:] != lang[:-1])) if len(lang) else []
        )[0]
        ends = np.append(starts[1:], len(lang))
        for s, e in zip(starts, ends):
            cum = np.cumsum(cnt[s:e])
            n = int(cum[-1])
            out["lang"].append(lang[s])
            out["n_docs"].append(n)
            for q in QS:
                rank = np.ceil(q * n)  # same doubles as duckdb's ceil
                out["p%d" % int(q * 100)].append(
                    int(val[s:e][np.searchsorted(cum, rank, side="left")])
                )
        return pa.table(
            {
                "lang": pa.array(out["lang"], type=pa.string()),
                "n_docs": pa.array(out["n_docs"], type=pa.int64()),
                **{
                    "p%d" % int(q * 100): pa.array(
                        out["p%d" % int(q * 100)], type=pa.int64()
                    )
                    for q in QS
                },
            }
        )

    ds = _read(sf_dir, "documents", ["lang", "n_chars"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return grouped_map(ds, "bucket", quantiles, num_partitions=8)


SQL_CHAR_QUANTILES = """
SELECT lang, count(*) AS n_docs,
       quantile_disc(n_chars, 0.25) AS p25,
       quantile_disc(n_chars, 0.50) AS p50,
       quantile_disc(n_chars, 0.75) AS p75,
       quantile_disc(n_chars, 0.95) AS p95,
       quantile_disc(n_chars, 0.99) AS p99
FROM documents GROUP BY lang
"""


def q_pack_assignment(sf_dir):
    """Sequence packing by token budget (stages/scan.py): every document
    gets the pack index floor(tokens_before / 2048) where tokens_before
    is the EXCLUSIVE running whitespace-token total in doc_id order — a
    distributed ordered prefix-scan (range-bucketed two-phase: tiny
    bucket-totals exchange + broadcast offsets), the primitive behind
    fixed-window training-batch packing."""
    from osm_export_tool_python_ray.functions.text import token_count
    from osm_export_tool_python_ray.stages.scan import ordered_prefix_scan

    def toks(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(
                    token_count(t.column("text").to_pylist()), type=pa.int64()
                ),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        toks, batch_format="pyarrow"
    )
    out = ordered_prefix_scan(ds, order_col="doc_id", value_col="n_tokens")

    def pack(t: pa.Table) -> pa.Table:
        c = t.column("cum_excl").to_numpy(zero_copy_only=False)
        return t.drop_columns(["cum_excl"]).append_column(
            "pack_id", pa.array((c // 2048).astype(np.int64))
        )

    return out.map_batches(pack, batch_format="pyarrow")


SQL_PACK_ASSIGNMENT = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+')) AS n_tokens,
       CAST((sum(len(regexp_extract_all(text, '\S+')))
                 OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             - len(regexp_extract_all(text, '\S+'))) // 2048 AS BIGINT)
         AS pack_id
FROM documents
"""


def q_top_docs(sf_dir):
    """Group-wise top-k (stages/topk.py): the 5 longest documents per
    language, deterministic tie-break on doc_id. Combiner-shaped: every
    input batch is pre-reduced to ≤ langs×5 candidate rows before the one
    exchange, so the shuffle is O(groups×k), not O(rows)."""
    from osm_export_tool_python_ray.stages.topk import topk_per_group

    return topk_per_group(
        _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"]),
        group_col="lang",
        sort_col="n_chars",
        tie_col="doc_id",
        k=5,
    )


SQL_TOP_DOCS = """
SELECT doc_id, lang, source, n_chars,
       row_number() OVER (PARTITION BY lang
                          ORDER BY n_chars DESC, doc_id ASC) AS rank
FROM documents
QUALIFY rank <= 5
"""


def q_theme_filter(sf_dir):
    """Matcher semantics over a tags map built from document columns —
    exercises the vectorized matcher hot path. WHERE (with the reference's
    right-associative no-precedence quirk):
        lang = 'en' AND n_chars > '200' OR source IN ('src1','src2')
    parses as AND(lang='en', OR(n_chars>'200', source IN (...))) and the
    ordering op compares LEXICOGRAPHICALLY."""
    from osm_export_tool_python_ray.sql import Matcher
    from osm_export_tool_python_ray.stages.matcher_eval import eval_expr, extract_tag_columns

    matcher = Matcher.from_sql("lang = 'en' AND n_chars > '200' OR source IN ('src1','src2')")

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        # build the tags map vectorized: interleave the three per-row
        # entries via a take pattern — no per-row Python list building
        lang = t.column("lang").combine_chunks().cast(pa.string())
        source = t.column("source").combine_chunks().cast(pa.string())
        n_chars = t.column("n_chars").combine_chunks().cast(pa.string())
        idx = np.arange(n, dtype=np.int64)
        keys = pa.array(["lang", "source", "n_chars"] * n, type=pa.string())
        vals = (
            pa.chunked_array([lang, source, n_chars])
            .combine_chunks()
            .take(pa.array(np.stack([idx, idx + n, idx + 2 * n], axis=1).ravel()))
        )
        offsets = pa.array(np.arange(0, 3 * n + 1, 3, dtype=np.int32))
        tags = pa.MapArray.from_arrays(offsets, keys, vals)
        cols = extract_tag_columns(tags, ["lang", "source", "n_chars"])
        mask = eval_expr(matcher.expr, cols, n)
        return t.filter(pa.array(mask)).select(["doc_id", "lang", "source", "n_chars"])

    return _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"]).map_batches(
        fn, batch_format="pyarrow"
    )


SQL_THEME_FILTER = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE lang = 'en' AND (CAST(n_chars AS VARCHAR) > '200' OR source IN ('src1','src2'))
"""


def q_lang_id(sf_dir):
    """Heuristic language-ID (oracle: SQL_LANG_ID re-derives the stopword
    argmax + fallbacks)."""
    from osm_export_tool_python_ray.stages.textstages import doc_lang

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        doc_lang, batch_format="pyarrow"
    )


def q_naive_bayes_lang(sf_dir):
    """Model TRAIN + SCORE inside the engine: a multinomial Naive Bayes
    language classifier fit on the even-doc_id half of the corpus and
    scored on the odd half — the distributed train/infer composition a
    labeling pipeline runs (fit token statistics at corpus scale,
    broadcast the fitted model, score map-side). Train pass: per-batch
    (lang, term) count combiner → ONE groupby exchange that moves
    VOCABULARY rows, not tokens; the model vocabulary is the global
    top-V=500 terms by a DISTRIBUTED ``.sort().limit(V)`` (the
    q_vocab_topk cut — the distinct-term table never reaches the driver);
    only the ≤ V×|langs| Laplace-smoothed count matrix and the |langs|
    doc-prior vector are collected and broadcast via ``ray.put``. Score
    pass: tokens → sorted-vocab searchsorted → per-token log-probs
    gathered from the broadcast int64 MICRO-NAT matrix and summed per doc
    with order-independent integer reduceat (the unigram_logprob
    quantization discipline — both sides quantize each (term, lang) cell
    ONCE, so parallel summation order cannot flip the hash); prediction
    is argmax with ties broken lang-ascending on both sides. Output per
    test doc: true lang, predicted lang, winning score in micro-nats."""
    import ray

    from osm_export_tool_python_ray.functions.text import alnum_tokens_batch

    V = 500
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    TRAIN_OUT = pa.schema(
        [("lang", pa.string()), ("term", pa.string()), ("tf", pa.int64())]
    )

    def train_partial(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (did % 2) == 0
        texts = [x for x, k in zip(t.column("text").to_pylist(), keep) if k]
        langs = np.asarray(t.column("lang").to_pylist(), dtype=object)[keep]
        flat, ntoks = alnum_tokens_batch(texts)
        if not flat:
            return TRAIN_OUT.empty_table()
        tok_lang = np.repeat(langs, ntoks)
        w = np.asarray(flat, dtype=object)
        lang_u, lang_inv = np.unique(tok_lang, return_inverse=True)
        term_u, term_inv = np.unique(w, return_inverse=True)
        nt = np.int64(len(term_u))
        upk, cnt = np.unique(lang_inv.astype(np.int64) * nt + term_inv, return_counts=True)
        return pa.table(
            {
                "lang": pa.array(list(lang_u[upk // nt]), type=pa.string()),
                "term": pa.array(list(term_u[upk % nt]), type=pa.string()),
                "tf": pa.array(cnt.astype(np.int64)),
            }
        )

    counts = (
        docs.map_batches(train_partial, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .sum(["tf"])
        .materialize()  # |langs|×|distinct terms| rows, distributed — never collected
    )

    # top-V vocabulary cut, fully distributed (tf desc, term asc at the
    # cut rank, deterministic on both sides)
    term_tot = counts.groupby("term").sum(["sum(tf)"])
    top_rows = (
        term_tot.sort(["sum(sum(tf))", "term"], descending=[True, False])
        .limit(V)
        .take_all()
    )
    vterms = np.sort(np.array([r["term"] for r in top_rows]))
    v_eff = len(vterms)

    lang_tok = {
        r["lang"]: int(r["sum(sum(tf))"])
        for r in counts.groupby("lang").sum(["sum(tf)"]).take_all()
    }

    def prior_partial(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (did % 2) == 0
        langs = np.asarray(t.column("lang").to_pylist(), dtype=object)[keep]
        lu, cnt = np.unique(langs, return_counts=True)
        return pa.table(
            {"lang": pa.array(list(lu), type=pa.string()), "nd": pa.array(cnt.astype(np.int64))}
        )

    prior_rows = (
        docs.map_batches(prior_partial, batch_format="pyarrow")
        .groupby("lang")
        .sum(["nd"])
        .take_all()
    )
    nd = {r["lang"]: int(r["sum(nd)"]) for r in prior_rows}
    langs_arr = np.array(sorted(nd), dtype=object)
    L = len(langs_arr)
    nd_total = sum(nd.values())

    # model rows: counts restricted to the vocabulary — ≤ V×L rows is the
    # ONLY train-side collect (the filter runs distributed, map-side)
    vref = ray.put(vterms)

    def vocab_filter(t: pa.Table) -> pa.Table:
        vt = cached_get(vref)
        w = np.asarray(t.column("term").to_pylist(), dtype=object)
        pos = np.searchsorted(vt, w)
        pos_c = np.minimum(pos, len(vt) - 1)
        return t.filter(pa.array((pos < len(vt)) & (vt[pos_c] == w)))

    model_rows = counts.map_batches(vocab_filter, batch_format="pyarrow").take_all()
    lidx = {l: i for i, l in enumerate(langs_arr)}
    cntm = np.zeros((v_eff, L), dtype=np.int64)
    for r in model_rows:
        if r["lang"] in lidx:
            cntm[np.searchsorted(vterms, r["term"]), lidx[r["lang"]]] = r["sum(tf)"]
    tot = np.array([lang_tok.get(l, 0) for l in langs_arr], dtype=np.float64)
    # each (term, lang) cell quantized ONCE to int64 micro-nats; per-doc
    # sums are then integer-exact and summation-order independent
    lp = qround(
        np.log((cntm + 1.0) / (tot + v_eff)) * 1e6, "nb_lp"
    ).reshape(cntm.shape)
    pri = qround(
        np.log(np.array([nd[l] for l in langs_arr], dtype=np.float64) / nd_total)
        * 1e6,
        "nb_prior",
    )
    model_ref = ray.put((vterms, lp, pri, langs_arr))

    SCORE_OUT = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("lang_pred", pa.string()),
            ("score_micro", pa.int64()),
        ]
    )

    def score(t: pa.Table) -> pa.Table:
        vt, lpm, pr, la = cached_get(model_ref)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (did % 2) == 1
        texts = [x for x, k in zip(t.column("text").to_pylist(), keep) if k]
        true_lang = np.asarray(t.column("lang").to_pylist(), dtype=object)[keep]
        ids = did[keep]
        if len(ids) == 0:
            return SCORE_OUT.empty_table()
        flat, ntoks = alnum_tokens_batch(texts)
        scores = np.tile(pr, (len(ids), 1))
        if flat:
            w = np.asarray(flat, dtype=object)
            pos = np.searchsorted(vt, w)
            pos_c = np.minimum(pos, len(vt) - 1)
            hit = (pos < len(vt)) & (vt[pos_c] == w)
            if hit.any():
                # tokens are concatenated in doc order, so the per-doc
                # hit index is non-decreasing → axis-0 reduceat, no
                # (slow, unbuffered) np.add.at needed
                dih = np.repeat(np.arange(len(ids)), ntoks)[hit]
                seg = np.flatnonzero(
                    np.concatenate(([True], dih[1:] != dih[:-1]))
                )
                scores[dih[seg]] += np.add.reduceat(lpm[pos_c[hit]], seg, axis=0)
        pred = np.argmax(scores, axis=1)  # first max → lang ascending
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "lang": pa.array(list(true_lang), type=pa.string()),
                "lang_pred": pa.array(list(la[pred]), type=pa.string()),
                "score_micro": pa.array(scores[np.arange(len(ids)), pred]),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


SQL_NAIVE_BAYES_LANG = r"""
WITH train AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 0),
toks AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM train
),
counts AS (SELECT lang, term, count(*) AS tf FROM toks GROUP BY 1, 2),
vocab AS (
  SELECT term FROM (SELECT term, sum(tf) AS ttf FROM counts GROUP BY term)
  ORDER BY ttf DESC, term LIMIT 500
),
veff AS (SELECT count(*) AS v FROM vocab),
doc_n AS (SELECT lang, count(*) AS ndocs FROM train GROUP BY lang),
lang_tot AS (SELECT lang, sum(tf) AS tot FROM counts GROUP BY lang),
priors AS (
  SELECT lang,
         {QR_PRIOR} AS p
  FROM doc_n
),
-- one quantization per (term, lang) cell, BEFORE any per-doc sum (the
-- unigram_logprob discipline: integer micro-nats are summation-order
-- independent, parallel float sums are not)
lp AS (
  SELECT d.lang, v.term,
         {QR_LP} AS lp
  FROM doc_n d
  CROSS JOIN vocab v
  LEFT JOIN lang_tot t ON t.lang = d.lang
  LEFT JOIN counts c ON c.lang = d.lang AND c.term = v.term
),
test AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 1),
ttoks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM test
),
tok_scores AS (
  SELECT tt.doc_id, lp.lang, sum(lp.lp) AS s
  FROM ttoks tt JOIN lp ON lp.term = tt.term
  GROUP BY 1, 2
),
scores AS (
  SELECT d.doc_id, pr.lang, coalesce(ts.s, 0) + pr.p AS score
  FROM test d
  CROSS JOIN priors pr
  LEFT JOIN tok_scores ts ON ts.doc_id = d.doc_id AND ts.lang = pr.lang
),
best AS (
  SELECT doc_id, lang AS lang_pred, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang ASC) AS rn
  FROM scores
)
SELECT t.doc_id, t.lang, b.lang_pred, CAST(b.score AS BIGINT) AS score_micro
FROM test t JOIN best b ON b.doc_id = t.doc_id AND b.rn = 1
""".format(
    QR_PRIOR=sql_qround(
        "ln(CAST(ndocs AS DOUBLE) / (SELECT sum(ndocs) FROM doc_n)) * 1e6"
    ),
    QR_LP=sql_qround(
        "ln((coalesce(c.tf, 0) + 1.0)"
        " / (coalesce(t.tot, 0) + (SELECT v FROM veff))) * 1e6"
    ),
)


def q_minhash_pairs(sf_dir):
    from osm_export_tool_python_ray.stages.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.5, num_buckets=16
    )


def q_simhash_pairs(sf_dir):
    from osm_export_tool_python_ray.stages.dedup import simhash_pairs

    return simhash_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), max_hamming=3, num_buckets=16
    )


def q_dedup_clusters(sf_dir):
    """Near-dup connected components over the MinHash pair graph (oracle:
    recursive min-label CTE over the SQL-re-derived MinHash pairs; pytest
    additionally covers union-find vs propagation equivalence)."""
    from osm_export_tool_python_ray.stages.dedup import dedup_clusters, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.5, num_buckets=16
    )
    return dedup_clusters(pairs, num_buckets=16).sort("doc_id")


def q_ngram_jaccard(sf_dir):
    from osm_export_tool_python_ray.stages.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), n=3, threshold=0.4, num_buckets=16
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("similarity"), "similarity", pc.round(t.column("similarity"), 6)
        ),
        batch_format="pyarrow",
    )


def _le64_expr(h, nbytes=8, digits="0123456789abcdef"):
    """DuckDB expression: little-endian uint64 from the first ``nbytes``
    bytes of a hex string — byte-exact with functions/text.py hash_bytes
    (md5 hex, lowercase) and with hex(encode(...)) output (uppercase —
    pass ``digits`` accordingly). Missing hex pairs read as 0 via strpos
    returning 0 for '' — callers must rpad when parsing variable-length
    hex. (Multiplication by 2^(8k) constants, not shifts: DuckDB
    range-checks UBIGINT left-shift in the signed domain.)"""
    terms = []
    for k in range(nbytes):
        hi = "CAST(strpos('%s', substr(%s, %d, 1))-1 AS UBIGINT)" % (digits, h, 2 * k + 1)
        lo = "CAST(strpos('%s', substr(%s, %d, 1))-1 AS UBIGINT)" % (digits, h, 2 * k + 2)
        terms.append("((%s * 16 + %s) * CAST(%d AS UBIGINT))" % (hi, lo, 1 << (8 * k)))
    return "(" + " + ".join(terms) + ")"


# le64(md5(doc_id)) % 10 — the same md5-first-8-LE family as hash_bytes,
# so the sampled row SET is byte-identical to stages/textstages.py
# hash_sample.
SQL_HASH_SAMPLE = """
SELECT doc_id, lang, source FROM documents
WHERE ({le}) % 10 = 0
""".format(le=_le64_expr("md5(CAST(doc_id AS VARCHAR))"))


def q_stratified_sample(sf_dir):
    """Exact-k stratified sample: the 20 docs per language with the
    SMALLEST le64(md5(doc_id)) — deterministic 'random' sampling with an
    exact per-stratum count (vs hash_sample's bernoulli rate), the same
    row set on every run and cluster size. Rides topk_per_group
    (ascending): per-batch bottom-k combiner, one exchange of candidate
    sets."""
    import hashlib

    from osm_export_tool_python_ray.stages.topk import topk_per_group

    def add_hash(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(d).encode()).digest()[:8], "little")
                for d in ids
            ),
            dtype=np.uint64,
            count=len(ids),
        )
        return t.append_column("skey", pa.array(h))

    out = topk_per_group(
        _read(sf_dir, "documents", ["doc_id", "lang", "source"]).map_batches(
            add_hash, batch_format="pyarrow"
        ),
        group_col="lang",
        sort_col="skey",
        tie_col="doc_id",
        k=20,
        ascending=True,
    )
    return out.map_batches(
        lambda t: t.drop_columns(["skey"]), batch_format="pyarrow"
    )


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang, source,
       row_number() OVER (PARTITION BY lang
                          ORDER BY ({le}) ASC, doc_id ASC) AS rank
FROM documents
QUALIFY rank <= 20
""".format(le=_le64_expr("md5(CAST(doc_id AS VARCHAR))"))


def q_lang_mad(sf_dir):
    """Robust statistics per group: median and median-absolute-deviation
    of doc length per language — the outlier-resistant spread measure a
    corpus audit uses where stddev is poisoned by the long tail. Both
    quantile cuts come from ONE histogram exchange (the char_quantiles
    combiner): the per-group (value, count) histogram is complete inside
    the fold, so the deviation quantile needs NO second data pass —
    deviations are re-binned from the histogram itself. Integer-exact;
    rank convention pinned to DuckDB quantile_disc (1-indexed
    ceil(q·n))."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map

    def partial(t: pa.Table) -> pa.Table:
        lang = t.column("lang").to_numpy(zero_copy_only=False)
        v = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        langs, inv = np.unique(lang, return_inverse=True)
        pair = inv.astype(np.int64) << np.int64(40) | v
        upair, cnt = np.unique(pair, return_counts=True)
        li = (upair >> np.int64(40)).astype(np.int64)
        import hashlib as _hl

        lb = np.asarray(
            [
                int.from_bytes(_hl.md5(s.encode()).digest()[:4], "little") % 16
                for s in langs
            ],
            dtype=np.int32,
        )
        return pa.table(
            {
                "lang": pa.array(list(langs[li]), type=pa.string()),
                "value": pa.array(upair & np.int64((1 << 40) - 1)),
                "cnt": pa.array(cnt.astype(np.int64)),
                "bucket": pa.array(lb[li]),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        OUT = pa.schema(
            [
                ("lang", pa.string()),
                ("n_docs", pa.int64()),
                ("median_chars", pa.int64()),
                ("mad_chars", pa.int64()),
            ]
        )
        if g.num_rows == 0:
            return OUT.empty_table()
        # merge cross-batch histogram partials first
        g = g.group_by(["lang", "value"]).aggregate([("cnt", "sum")])
        g = g.sort_by([("lang", "ascending"), ("value", "ascending")])
        lang = np.asarray(g.column("lang").to_pylist(), dtype=object)
        val = g.column("value").to_numpy(zero_copy_only=False)
        cnt = g.column("cnt_sum").to_numpy(zero_copy_only=False)
        starts = np.nonzero(np.concatenate(([True], lang[1:] != lang[:-1])))[0]
        ends = np.append(starts[1:], len(lang))
        out = {"lang": [], "n_docs": [], "median_chars": [], "mad_chars": []}
        for s, e in zip(starts, ends):
            vv, cc = val[s:e], cnt[s:e]
            cum = np.cumsum(cc)
            n = int(cum[-1])
            med = int(vv[np.searchsorted(cum, np.ceil(0.5 * n), side="left")])
            dev = np.abs(vv - med)
            order = np.argsort(dev, kind="stable")
            dcum = np.cumsum(cc[order])
            mad = int(dev[order][np.searchsorted(dcum, np.ceil(0.5 * n), side="left")])
            out["lang"].append(lang[s])
            out["n_docs"].append(n)
            out["median_chars"].append(med)
            out["mad_chars"].append(mad)
        return pa.table(
            {
                "lang": pa.array(out["lang"], type=pa.string()),
                "n_docs": pa.array(out["n_docs"], type=pa.int64()),
                "median_chars": pa.array(out["median_chars"], type=pa.int64()),
                "mad_chars": pa.array(out["mad_chars"], type=pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["lang", "n_chars"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return grouped_map(ds, "bucket", lambda g: fold(g.drop_columns(["bucket"])), num_partitions=8)


SQL_LANG_MAD = """
WITH m AS (
  SELECT lang, quantile_disc(n_chars, 0.5) AS med
  FROM documents GROUP BY lang
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(m.med) AS BIGINT) AS median_chars,
       CAST(quantile_disc(abs(d.n_chars - m.med), 0.5) AS BIGINT) AS mad_chars
FROM documents d JOIN m USING (lang)
GROUP BY d.lang
"""


def q_embedding_coverage(sf_dir):
    """Referential-integrity audit (relational ANTI-join, aggregated):
    per language, how many documents have NO embedding row
    (doc_id ∉ embeddings.vec_id) — the coverage-gap report run before
    any embedding-dependent stage (ANN, dedup, clustering). Rides
    bucket_join(how='left') + a null count: one keyed exchange, both
    sides streamed, no broadcast requirement (the embedding table is as
    large as the corpus at production scale). Aggregated rather than
    row-listing so the report is stable and non-empty at any coverage
    level (a fully-covered corpus returns n_missing = 0 per lang, not
    an empty — and schema-less — dataset)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from osm_export_tool_python_ray.stages.joins import bucket_join

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    embs = _read(sf_dir, "embeddings", ["vec_id"]).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("vec_id"),
                "has_emb": pa.array(
                    np.ones(t.num_rows, dtype=np.int8), type=pa.int8()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucket_join(
        docs,
        embs,
        key="doc_id",
        how="left",
        left_schema=pa.schema([("doc_id", pa.int64()), ("lang", pa.string())]),
        right_schema=pa.schema([("doc_id", pa.int64()), ("has_emb", pa.int8())]),
    )

    def partial(t: pa.Table) -> pa.Table:
        lang = np.asarray(t.column("lang").to_pylist(), dtype=object)
        miss = pc.is_null(t.column("has_emb")).to_numpy(zero_copy_only=False)
        langs, inv = np.unique(lang, return_inverse=True)
        n = np.bincount(inv, minlength=len(langs)).astype(np.int64)
        nm = np.bincount(inv, weights=miss.astype(np.float64), minlength=len(langs)).astype(np.int64)
        return pa.table(
            {
                "lang": pa.array(list(langs), type=pa.string()),
                "n_docs": pa.array(n),
                "n_missing": pa.array(nm),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_missing", alias_name="n_missing"))
    )


SQL_EMBEDDING_COVERAGE = """
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE e.vec_id IS NULL) AS BIGINT) AS n_missing
FROM documents d LEFT JOIN embeddings e ON e.vec_id = d.doc_id
GROUP BY d.lang
"""


def q_gap_histogram(sf_dir):
    """Window-LAG family: distribution of inter-event gaps per
    event_type — each user's consecutive-event time delta (the LAG
    diff), bucketed into float-free log2 µs bins (the
    activity_histogram binning) and counted per (event_type, bin).
    The latency/cadence profile a pipeline reads before choosing
    session gaps and window sizes. ONE user-keyed exchange; the lag is
    a shifted comparison inside the fold (no per-user loop); zero gaps
    land in bin −1 (integer bit_length−1 convention on both sides)."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map, keyed_sum

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def keyed(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "user_id": pa.array(u),
                "ts": pa.array(ts),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "bucket": pa.array((u % 32).astype(np.int32)),
            }
        )

    def lag_bins(g: pa.Table) -> pa.Table:
        OUT = pa.schema(
            [("event_type", pa.string()), ("bin", pa.int64()), ("n", pa.int64())]
        )
        if g.num_rows == 0:
            return OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u, ts, et = u[order], ts[order], et[order]
        same = u[1:] == u[:-1]
        gap = (ts[1:] - ts[:-1])[same]
        # the gap is attributed to the LATER event's type (the LAG row)
        typ = et[1:][same]
        # floor(log2 gap) via frexp; gap == 0 -> bin -1 (frexp exp 0)
        _m, e = np.frexp(gap.astype(np.float64))
        b = e.astype(np.int64) - 1
        types, tinv = np.unique(typ, return_inverse=True)
        pk = tinv.astype(np.int64) * 128 + (b + 1)
        upk, cnt = np.unique(pk, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(
                    list(types[(upk // 128).astype(np.int64)]), type=pa.string()
                ),
                "bin": pa.array((upk % 128) - 1),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = grouped_map(
        ds.map_batches(keyed, batch_format="pyarrow"),
        "bucket",
        lambda g: lag_bins(g.drop_columns(["bucket"])),
        num_partitions=8,
        payload_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("ts", pa.int64()),
                ("event_id", pa.int64()),
                ("event_type", pa.string()),
            ]
        ),
    )
    # final fold over the tiny (type, bin) aggregate
    from ray.data.aggregate import Sum

    return partials.groupby(["event_type", "bin"]).aggregate(
        Sum("n", alias_name="n")
    )


SQL_GAP_HISTOGRAM = """
WITH lagged AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT event_type,
       CASE WHEN gap = 0 THEN -1
            ELSE length(bin(CAST(gap AS BIGINT))) - 1 END AS bin,
       CAST(count(*) AS BIGINT) AS n
FROM lagged WHERE gap IS NOT NULL
GROUP BY 1, 2
"""


def q_watermark_late(sf_dir):
    """Event-time watermark semantics (the Flink/Beam allowed-lateness
    model — Ray Data has no event-time watermarks, so the engine supplies
    them): events arrive out of order (arrival = event time + a
    deterministic splitmix64 network delay in [0, 600 s)); processing in
    ARRIVAL order per user, the raw watermark is the running max of
    event-time over previously-arrived events, and an event is LATE when
    its event-time sits more than the 120 s allowed lateness behind that
    watermark (it would be dropped / side-outputted by a streaming
    runner). Per user: event count, late count, and worst observed
    watermark lag in integer µs — the numbers that size a real pipeline's
    allowed-lateness budget. ONE user-keyed exchange; the per-partition
    fold is a fully vectorized SEGMENTED prefix-max (Hillis–Steele
    doubling with a segment-start guard — log2(longest user run) passes,
    no per-user Python loop); per-user totals via reduceat on segment
    starts. Integer µs throughout — no float, no rounding flakes."""
    from osm_export_tool_python_ray.functions.text import _mix64
    from osm_export_tool_python_ray.stages.exchange import grouped_map

    DELAY_MOD = np.uint64(600_000_000)  # simulated delay in [0, 600 s)
    LATE_US = np.int64(120_000_000)  # allowed lateness: 120 s
    GOLD = np.uint64(0x9E3779B97F4A7C15)

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def keyed(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            delay = (_mix64(eid.astype(np.uint64) * GOLD) % DELAY_MOD).astype(
                np.int64
            )
        return pa.table(
            {
                "user_id": pa.array(u),
                "tsu": pa.array(ts),
                "event_id": pa.array(eid),
                "arrival": pa.array(ts + delay),
                "bucket": pa.array((u % 32).astype(np.int32)),
            }
        )

    OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_events", pa.int64()),
            ("n_late", pa.int64()),
            ("max_lateness_us", pa.int64()),
        ]
    )

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("tsu").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        arr = g.column("arrival").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, arr, u))  # (user, arrival, event_id)
        u, ts = u[order], ts[order]
        n = len(u)
        idx = np.arange(n, dtype=np.int64)
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = u[1:] != u[:-1]
        start = np.maximum.accumulate(np.where(new_seg, idx, 0))
        s_idx = idx[new_seg]
        seg_len = np.diff(np.append(s_idx, n))
        # segmented prefix-max of event-time in arrival order: after pass
        # k, cm[i] = max ts over [max(start_i, i-2^k+1), i]; the
        # i-d >= start guard keeps every merge inside one user's segment
        # (cm[i-d]'s window is already clipped at the same start by
        # induction), so log2(longest run) passes suffice.
        LOW = np.iinfo(np.int64).min
        cm = ts.copy()
        d = 1
        max_run = int(seg_len.max())
        while d < max_run:
            shifted = np.concatenate((np.full(d, LOW, dtype=np.int64), cm[:-d]))
            np.maximum(cm, np.where(idx - d >= start, shifted, LOW), out=cm)
            d <<= 1
        # watermark BEFORE row i = segment-shifted cm (first arrival of a
        # user has no watermark yet)
        wm = np.concatenate(([LOW], cm[:-1]))
        wm[new_seg] = LOW
        has_wm = wm != LOW
        wm_safe = np.where(has_wm, wm, ts)  # no int64 underflow below
        late = has_wm & (ts < wm_safe - LATE_US)
        lag = np.where(has_wm & (wm_safe > ts), wm_safe - ts, 0)
        return pa.table(
            {
                "user_id": pa.array(u[new_seg]),
                "n_events": pa.array(seg_len.astype(np.int64)),
                "n_late": pa.array(np.add.reduceat(late.astype(np.int64), s_idx)),
                "max_lateness_us": pa.array(
                    np.maximum.reduceat(lag, s_idx).astype(np.int64)
                ),
            }
        )

    return grouped_map(
        ds.map_batches(keyed, batch_format="pyarrow"),
        "bucket",
        lambda g: fold(g.drop_columns(["bucket"])),
        num_partitions=8,
        payload_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("tsu", pa.int64()),
                ("event_id", pa.int64()),
                ("arrival", pa.int64()),
            ]
        ),
    )


def _build_watermark_late_sql():
    delay = _sql_mix64(
        _sql_mulmod64(
            "CAST(event_id AS UBIGINT)",
            "CAST('%d' AS UBIGINT)" % 0x9E3779B97F4A7C15,
        )
    )
    return """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tsu,
         CAST({delay} % 600000000 AS BIGINT) AS delay
  FROM events
),
w AS (
  SELECT user_id, tsu,
         max(tsu) OVER (PARTITION BY user_id ORDER BY tsu + delay, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM e
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(coalesce(sum(CASE WHEN tsu < wm - 120000000 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_late,
       CAST(coalesce(max(CASE WHEN wm > tsu THEN wm - tsu ELSE 0 END), 0)
            AS BIGINT) AS max_lateness_us
FROM w GROUP BY user_id
""".format(delay=delay)


# SQL_WATERMARK_LATE is assigned right after _sql_mix64 is defined below.


def q_monthly_rollup(sf_dir):
    """Calendar-grain rollup: per (calendar month, event_type), event
    count and exact value sum in integer cents — the civil-calendar
    sibling of events_window's hourly bucketing (months are not a fixed
    number of microseconds, so epoch arithmetic can't produce them).
    numpy's datetime64[M] cast IS the civil-month truncation and matches
    DuckDB date_trunc('month', ts) exactly. Per-batch (month, type)
    combiner, one tiny keyed groupby; cents quantized per row before any
    sum (the cube_rollup discipline) so totals are summation-order
    independent."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        month = ts.astype("datetime64[M]").astype("datetime64[us]")
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        # floor(v*100 + 0.5): the repo's half-up quantize rule (olap.py
        # _cents) — np.round would be half-EVEN and flip vs DuckDB's
        # half-away round() at exact .5 boundaries
        cents = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        types, tinv = np.unique(et, return_inverse=True)
        months, minv = np.unique(month, return_inverse=True)
        pk = minv.astype(np.int64) * len(types) + tinv
        upk, inv = np.unique(pk, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        # exact int64 group sums via sorted reduceat (bincount weights
        # would route through float64 — exact only below 2^53)
        order = np.argsort(inv, kind="stable")
        cs = cents[order]
        starts = np.nonzero(
            np.concatenate([[True], inv[order][1:] != inv[order][:-1]])
        )[0]
        c = np.add.reduceat(cs, starts)
        return pa.table(
            {
                "month": pa.array(months[(upk // len(types)).astype(np.int64)]),
                "event_type": pa.array(
                    list(types[(upk % len(types)).astype(np.int64)]),
                    type=pa.string(),
                ),
                "n": pa.array(n),
                "value_cents": pa.array(c),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["month", "event_type"])
        .aggregate(
            Sum("n", alias_name="n"), Sum("value_cents", alias_name="value_cents")
        )
    )


SQL_MONTHLY_ROLLUP = """
SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2
"""


def q_length_outliers(sf_dir):
    """Robust outlier flags: documents whose length deviates from their
    language's median by more than 3×MAD (the modified z-score gate,
    integer-exact: |x − med| > 3·mad) — the two-phase
    aggregate-then-probe composition: phase 1 computes the tiny per-lang
    (median, MAD) table (q_lang_mad's one histogram exchange), phase 2
    broadcasts it via ray.put and flags per batch with a searchsorted
    probe. The corpus is scanned twice but never shuffled; the broadcast
    is |langs| rows."""
    import ray

    stats = q_lang_mad(sf_dir).to_pandas()
    langs = np.asarray(stats["lang"], dtype=object)
    order = np.argsort(langs)
    sref = ray.put(
        (
            langs[order],
            stats["median_chars"].to_numpy()[order],
            stats["mad_chars"].to_numpy()[order],
        )
    )

    def flag(t: pa.Table) -> pa.Table:
        ls, med, mad = cached_get(sref)
        lang = np.asarray(t.column("lang").to_pylist(), dtype=object)
        v = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ls, lang)
        pos = np.minimum(pos, len(ls) - 1)
        dev = np.abs(v - med[pos])
        out = dev > 3 * mad[pos]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "n_chars": pa.array(v),
                "deviation": pa.array(dev.astype(np.int64)),
                "is_outlier": pa.array(out),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).map_batches(
        flag, batch_format="pyarrow"
    )


SQL_LENGTH_OUTLIERS = """
WITH m AS (
  SELECT lang, quantile_disc(n_chars, 0.5) AS med
  FROM documents GROUP BY lang
),
s AS (
  SELECT d.lang,
         max(m.med) AS med,
         quantile_disc(abs(d.n_chars - m.med), 0.5) AS mad
  FROM documents d JOIN m USING (lang) GROUP BY d.lang
)
SELECT d.doc_id, d.lang, d.n_chars,
       CAST(abs(d.n_chars - s.med) AS BIGINT) AS deviation,
       abs(d.n_chars - s.med) > 3 * s.mad AS is_outlier
FROM documents d JOIN s USING (lang)
"""


def q_source_dup_rate(sf_dir):
    """Per-source duplication diagnostic (corpus-curation report): for
    every source, total docs, distinct text fingerprints, and duplicate
    count (n_docs − n_distinct) — the "which feed is flooding the corpus
    with copies" breakdown read before weighting sources in a data mix.
    Rides the exact-dedup 128-bit text hash; per-batch (source, hash)
    dedup combiner, ONE hash-bucketed exchange moving deduped pairs, then
    a tiny per-source fold."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map
    from osm_export_tool_python_ray.functions.text import hash_strings_128
    from ray.data.aggregate import Sum

    def pairs(t: pa.Table) -> pa.Table:
        h1, _h2 = hash_strings_128(t.column("text"))
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        # batch-local (source, hash) dedup via two-column lexsort — NOT
        # string concatenation, which is ambiguous without a separator
        hs = h1.astype(np.int64)
        order = np.lexsort((hs, src))
        src, hs = src[order], hs[order]
        first = np.concatenate(
            [[True], (src[1:] != src[:-1]) | (hs[1:] != hs[:-1])]
        )
        ps = np.nonzero(first)[0]
        cnt = np.diff(np.append(ps, len(src))).astype(np.int64)
        src, hs = src[ps], hs[ps]
        return pa.table(
            {
                "source": pa.array(list(src), type=pa.string()),
                "h": pa.array(hs),
                "n": pa.array(cnt),
                "bucket": pa.array(
                    (hs.astype(np.uint64) % np.uint64(32)).astype(np.int32)
                ),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        OUT = pa.schema(
            [
                ("source", pa.string()),
                ("n_docs", pa.int64()),
                ("n_distinct", pa.int64()),
            ]
        )
        if g.num_rows == 0:
            return OUT.empty_table()
        # merge cross-batch partials: per (source, h) total count, then
        # per source: Σ counts (docs) and #distinct hashes
        agg = g.group_by(["source", "h"]).aggregate([("n", "sum")])
        per = agg.group_by(["source"]).aggregate(
            [("n_sum", "sum"), ("h", "count")]
        )
        return pa.table(
            {
                "source": per.column("source"),
                "n_docs": per.column("n_sum_sum").cast(pa.int64()),
                "n_distinct": per.column("h_count").cast(pa.int64()),
            }
        )

    per_bucket = grouped_map(
        _read(sf_dir, "documents", ["source", "text"]).map_batches(
            pairs, batch_format="pyarrow"
        ),
        "bucket",
        lambda g: fold(g.drop_columns(["bucket"])),
        num_partitions=8,
        payload_schema=pa.schema(
            [("source", pa.string()), ("h", pa.int64()), ("n", pa.int64())]
        ),
    )
    # per-bucket partials → final tiny per-source fold (hashes are
    # partitioned by bucket, so distinct counts add across buckets)
    out = per_bucket.groupby("source").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_distinct", alias_name="n_distinct"),
    )
    return out.map_batches(
        lambda t: t.append_column(
            "n_dups",
            pc.subtract(t.column("n_docs"), t.column("n_distinct")),
        ),
        batch_format="pyarrow",
    )


SQL_SOURCE_DUP_RATE = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT text) AS BIGINT) AS n_distinct,
       CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_dups
FROM documents GROUP BY source
"""


def q_dedup_best(sf_dir):
    """Policy-based dedup canonicalization over NORMALIZED text: docs
    whose lowercased, whitespace-collapsed text coincides form one
    group; keep the representative with the longest ORIGINAL text, then
    smallest doc_id — the upgrade of exact_dedup's byte-identity
    first-wins rule a curation pipeline actually wants (casing/spacing
    mirrors collapse, the best-formatted copy survives). Normalization
    is RE2 `\\s+`→' ' + trim + lower on BOTH sides (pyarrow and DuckDB
    both run RE2, so the whitespace class is identical). Same 128-bit
    hash + ONE hash-bucketed exchange; the fold is a vectorized
    (hash, −n_chars, doc_id) lexsort + group-first pick."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map
    from osm_export_tool_python_ray.functions.text import hash_strings_128

    def keyed(t: pa.Table) -> pa.Table:
        # trim ASCII space only (characters=" ") — DuckDB's trim() is
        # ASCII-space; utf8_trim_whitespace would also strip unicode
        # whitespace RE2's \s never collapsed, diverging the two sides
        norm = pc.utf8_trim(
            pc.replace_substring_regex(
                pc.utf8_lower(t.column("text")), r"\s+", " "
            ),
            characters=" ",
        )
        h1, h2 = hash_strings_128(norm)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chars": t.column("n_chars"),
                "h1": pa.array(h1.astype(np.int64)),
                "h2": pa.array(h2.astype(np.int64)),
                "bucket": pa.array(
                    (h1.astype(np.uint64) % np.uint64(32)).astype(np.int32)
                ),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        OUT = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_chars", pa.int64()),
                ("n_copies", pa.int64()),
            ]
        )
        if g.num_rows == 0:
            return OUT.empty_table()
        h1 = g.column("h1").to_numpy(zero_copy_only=False)
        h2 = g.column("h2").to_numpy(zero_copy_only=False)
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        nc = g.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((d, -nc, h2, h1))
        h1, h2, d, nc = h1[order], h2[order], d[order], nc[order]
        first = np.concatenate(
            [[True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
        )
        ps = np.nonzero(first)[0]
        return pa.table(
            {
                "doc_id": pa.array(d[ps]),
                "n_chars": pa.array(nc[ps]),
                "n_copies": pa.array(np.diff(np.append(ps, len(d))).astype(np.int64)),
            }
        )

    return grouped_map(
        _read(sf_dir, "documents", ["doc_id", "text", "n_chars"]).map_batches(
            keyed, batch_format="pyarrow"
        ),
        "bucket",
        lambda g: fold(g.drop_columns(["bucket"])),
        num_partitions=8,
        payload_schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_chars", pa.int64()),
                ("h1", pa.int64()),
                ("h2", pa.int64()),
            ]
        ),
    )


SQL_DEDUP_BEST = r"""
WITH n AS (
  SELECT doc_id, n_chars,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id, n_chars,
       CAST(count(*) OVER (PARTITION BY norm) AS BIGINT) AS n_copies
FROM n
QUALIFY row_number() OVER (
  PARTITION BY norm ORDER BY n_chars DESC, doc_id ASC
) = 1
"""


def q_fd_check(sf_dir):
    """Functional-dependency audit (schema-discovery / data-profiling
    family): does lang → source hold, and does source → lang hold?
    For each candidate FD, the number of LHS values, the number of
    distinct (LHS, RHS) pairs, and violations = pairs − lhs (0 ⇔ the FD
    holds). Per-batch distinct-pair combiner; the exchange moves only
    the distinct-pair aggregate."""
    from ray.data.aggregate import Count

    def pairs(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "source"]).aggregate([])
        return g

    distinct_pairs = (
        _read(sf_dir, "documents", ["lang", "source"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="_"))
    )

    def summarize(t: pa.Table) -> pa.Table:
        lang = np.asarray(t.column("lang").to_pylist(), dtype=object)
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        n_pairs = len(lang)
        n_lang = len(np.unique(lang))
        n_src = len(np.unique(src))
        return pa.table(
            {
                "fd": pa.array(
                    ["lang->source", "source->lang"], type=pa.string()
                ),
                "n_lhs": pa.array([n_lang, n_src], type=pa.int64()),
                "n_pairs": pa.array([n_pairs, n_pairs], type=pa.int64()),
                "violations": pa.array(
                    [n_pairs - n_lang, n_pairs - n_src], type=pa.int64()
                ),
            }
        )

    # the distinct-pair table is ≤ |langs|·|sources| rows — one tiny
    # repartition to a single summarizer is aggregate-sized by design
    return distinct_pairs.repartition(1).map_batches(
        summarize, batch_format="pyarrow"
    )


SQL_FD_CHECK = """
WITH p AS (SELECT DISTINCT lang, source FROM documents),
s AS (
  SELECT count(*) AS n_pairs,
         count(DISTINCT lang) AS n_lang,
         count(DISTINCT source) AS n_src
  FROM p
)
SELECT 'lang->source' AS fd, CAST(n_lang AS BIGINT) AS n_lhs,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(n_pairs - n_lang AS BIGINT) AS violations FROM s
UNION ALL
SELECT 'source->lang', CAST(n_src AS BIGINT), CAST(n_pairs AS BIGINT),
       CAST(n_pairs - n_src AS BIGINT) FROM s
"""


def q_k_anonymity(sf_dir):
    """Privacy audit (k-anonymity over quasi-identifiers): per
    (lang, source) equivalence class, the document count and whether the
    class violates k = 5 — the re-identification risk report run
    alongside PII redaction before a corpus release (Sweeney 2002).
    Per-batch class-count combiner, one tiny composite groupby; the
    exchange moves |langs|·|sources| aggregate rows, never documents."""
    from ray.data.aggregate import Sum

    K = 5

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g.column("lang"),
                "source": g.column("source"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    counted = (
        _read(sf_dir, "documents", ["lang", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def flag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "violates_k", pc.less(t.column("n"), K)
        )

    return counted.map_batches(flag, batch_format="pyarrow")


SQL_K_ANONYMITY = """
SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
       count(*) < 5 AS violates_k
FROM documents GROUP BY lang, source
"""


def q_weighted_sample(sf_dir):
    """Deterministic WEIGHTED sample without replacement (Efraimidis &
    Spirakis 2006 A-ES): keep the k=100 docs with the largest
    u^(1/w) ⟺ largest ln(u)/w, weight w = n_chars — long documents
    proportionally more likely, same row set on every run and cluster
    size (u is the md5-hash uniform, no RNG state).

    The float key is made EXACTLY reproducible on both sides by the
    rational-order trick: quantize ln(u) to int64 micro-nats first,
    then compare via akey = floor(lnq·10⁹ / w) — pure int64 (|lnq| ≤
    22·10⁶ so lnq·10⁹ ≈ 2.2·10¹⁶ fits), floor-division-corrected in
    SQL (DuckDB // truncates toward zero, numpy floors; lnq ≤ 0 here).
    Rides topk_per_group with a constant stratum: per-batch top-k
    combiner, ONE exchange of ≤k·num_blocks candidate rows."""
    import hashlib

    from osm_export_tool_python_ray.stages.topk import topk_per_group

    M = 1 << 31

    def add_key(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(d).encode()).digest()[:8], "little")
                for d in ids
            ),
            dtype=np.uint64,
            count=len(ids),
        )
        u = ((h % M).astype(np.float64) + 1.0) / float(M + 1)
        lnq = qround(np.log(u) * 1e6, "wsample_lnq")
        w = np.maximum(
            t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64), 1
        )
        akey = (lnq * 1_000_000_000) // w  # numpy floors; lnq ≤ 0
        out = t.select(["doc_id", "lang"])
        out = out.append_column("akey", pa.array(akey))
        return out.append_column(
            "grp", pa.array(np.zeros(len(akey), dtype=np.int64))
        )

    out = topk_per_group(
        _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).map_batches(
            add_key, batch_format="pyarrow"
        ),
        group_col="grp",
        sort_col="akey",
        tie_col="doc_id",
        k=100,
    )
    return out.map_batches(
        lambda t: t.drop_columns(["grp"]), batch_format="pyarrow"
    )


SQL_WEIGHTED_SAMPLE = """
WITH k AS (
  SELECT doc_id, lang, greatest(n_chars, 1) AS w,
         {QR_LNQ} AS lnq
  FROM documents
), r AS (
  SELECT doc_id, lang,
         lnq * 1000000000 // w
           - CASE WHEN (lnq * 1000000000) % w <> 0 AND lnq < 0
                  THEN 1 ELSE 0 END AS akey
  FROM k
)
SELECT doc_id, lang, akey,
       row_number() OVER (ORDER BY akey DESC, doc_id ASC) AS rank
FROM r QUALIFY rank <= 100
""".format(
    QR_LNQ=sql_qround(
        "ln((("
        + _le64_expr("md5(CAST(doc_id AS VARCHAR))")
        + ") % 2147483648 + 1) / 2147483649.0) * 1e6"
    )
)


# full SimHash re-derivation in SQL (oracle for q_simhash_pairs): per-doc
# 64-bit signature from distinct-token md5 bit votes, 4×16-bit LSH bands
# with the engine's max_group=512 cap, exact Hamming verify via
# bit_count(xor). Hash family identical (hash_bytes = md5 first-8-LE).
SQL_SIMHASH_PAIRS = """
WITH tok AS (
  SELECT DISTINCT doc_id, lower(t) AS tk FROM (
    SELECT doc_id, UNNEST(regexp_extract_all(text, '\\S+')) AS t FROM documents)
),
th AS (SELECT doc_id, {le} AS hv FROM (SELECT doc_id, md5(tk) AS h FROM tok)),
bits AS (
  SELECT doc_id, b.j,
         sum(CASE WHEN (hv >> CAST(b.j AS UBIGINT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th, range(64) b(j) GROUP BY doc_id, b.j
),
sig0 AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN CAST(power(2, j) AS UBIGINT) ELSE CAST(0 AS UBIGINT) END) AS s
  FROM bits GROUP BY doc_id
),
sig AS (
  SELECT d.doc_id, coalesce(s0.s, CAST(0 AS UBIGINT)) AS s
  FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN sig0 s0 ON s0.doc_id = d.doc_id
),
bands AS (
  SELECT doc_id, s,
         (CAST(b.b AS UBIGINT) << 16) | ((s >> CAST(16 * b.b AS UBIGINT)) & 65535) AS band_key
  FROM sig, range(4) b(b)
),
ok_bands AS (SELECT band_key FROM bands GROUP BY band_key HAVING count(*) <= 512),
bk AS (SELECT bands.* FROM bands JOIN ok_bands USING (band_key)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.s AS sa, b.s AS sb
  FROM bk a JOIN bk b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, 1.0 - bit_count(xor(sa, sb)) / 64.0 AS similarity
FROM cand WHERE bit_count(xor(sa, sb)) <= 3
""".format(le=_le64_expr("h"))


def _build_lang_id_sql():
    """Oracle for the stopword-argmax language-ID heuristic
    (functions/text.py lang_id): distinct lowercase alpha words, per-lang
    stopword hit counts, FIRST-max-wins in the dict iteration order
    (en, de, fr, es), CJK/ASCII fallback when no stopword hits."""
    from osm_export_tool_python_ray.functions.text import STOPWORDS

    def inlist(lang):
        return ", ".join("'%s'" % w for w in sorted(STOPWORDS[lang]))

    return (
        r"""
WITH words AS (
  SELECT DISTINCT doc_id, lower(w) AS w FROM (
    SELECT doc_id, UNNEST(regexp_extract_all(text, '[a-zA-Z]+')) AS w FROM documents)
),
hits AS (
  SELECT doc_id,
         count(*) FILTER (WHERE w IN (__EN__)) AS en,
         count(*) FILTER (WHERE w IN (__DE__)) AS de,
         count(*) FILTER (WHERE w IN (__FR__)) AS fr,
         count(*) FILTER (WHERE w IN (__ES__)) AS es,
         count(*) AS nwords
  FROM words GROUP BY doc_id
),
cjk AS (
  SELECT doc_id, bool_or(regexp_matches(text, '[\x{2E81}-\x{10FFFF}]')) AS has_cjk
  FROM documents GROUP BY doc_id
)
SELECT d.doc_id,
  CASE
    WHEN h.doc_id IS NULL OR h.nwords = 0 THEN 'und'
    WHEN greatest(h.en, h.de, h.fr, h.es) = 0 THEN (CASE WHEN c.has_cjk THEN 'zh' ELSE 'en' END)
    WHEN h.en = greatest(h.en, h.de, h.fr, h.es) THEN 'en'
    WHEN h.de = greatest(h.en, h.de, h.fr, h.es) THEN 'de'
    WHEN h.fr = greatest(h.en, h.de, h.fr, h.es) THEN 'fr'
    ELSE 'es'
  END AS lang_pred
FROM (SELECT DISTINCT doc_id, text FROM documents) d
LEFT JOIN hits h ON h.doc_id = d.doc_id
LEFT JOIN cjk c ON c.doc_id = d.doc_id
"""
        .replace("__EN__", inlist("en"))
        .replace("__DE__", inlist("de"))
        .replace("__FR__", inlist("fr"))
        .replace("__ES__", inlist("es"))
    )


SQL_LANG_ID = _build_lang_id_sql()


def _build_embedding_near_dup_sql(dim=64, num_planes=4, seed=42, threshold=0.4, max_group=2048):
    """Oracle for q_embedding_near_dup: the seeded hyperplane matrix is
    inlined as literals, sign-signature buckets and the in-bucket cosine
    verify re-derived in SQL. The engine computes in float64 (see
    stages/ann.py embedding_near_dup) so the only divergence is summation
    order — far inside the round(…, 5)."""
    planes = np.random.RandomState(seed).randn(dim, num_planes)

    def dot_expr(col, vec):
        return "(" + " + ".join(
            "%s[%d] * (%.17g)" % (col, i + 1, vec[i]) for i in range(len(vec))
        ) + ")"

    norm = "sqrt(" + " + ".join("v[%d]*v[%d]" % (i + 1, i + 1) for i in range(dim)) + ")"
    signs = " + ".join(
        "(CASE WHEN %s > 0 THEN %d ELSE 0 END)" % (dot_expr("nv", planes[:, p]), 1 << p)
        for p in range(num_planes)
    )
    pair_dot = "(" + " + ".join(
        "a.nv[%d]*b.nv[%d]" % (i + 1, i + 1) for i in range(dim)
    ) + ")"
    return """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
nrm AS (SELECT vec_id, greatest({norm}, 1e-12) AS nr, v FROM base),
nv AS (SELECT vec_id, list_transform(v, x -> x / nr) AS nv FROM nrm),
keyed AS (SELECT vec_id, nv, ({signs}) AS bkey FROM nv),
okb AS (SELECT bkey FROM keyed GROUP BY bkey HAVING count(*) BETWEEN 2 AND {mg}),
kx AS (SELECT keyed.* FROM keyed JOIN okb USING (bkey)),
cand AS (
  SELECT DISTINCT least(a.vec_id, b.vec_id) AS doc_a, greatest(a.vec_id, b.vec_id) AS doc_b,
         {pd} AS sim
  FROM kx a JOIN kx b ON a.bkey = b.bkey AND a.vec_id < b.vec_id
)
SELECT doc_a, doc_b, round(sim, 5) AS similarity FROM cand WHERE sim >= {th}
""".format(norm=norm, signs=signs, pd=pair_dot, mg=max_group, th=threshold)


SQL_EMBEDDING_NEAR_DUP = _build_embedding_near_dup_sql()


def _sql_mulmod64(a, b):
    """Wrapping uint64 multiply in DuckDB: split-multiply via HUGEINT so
    the 64×64→128 product never overflows INT128:
    a·b mod 2^64 = ((a_hi·b mod 2^32)·2^32 + a_lo·b) mod 2^64."""
    return (
        "CAST(((CAST((((CAST({a} AS HUGEINT) >> 32) * CAST({b} AS HUGEINT)) % 4294967296) AS HUGEINT) * 4294967296)"
        " + ((CAST({a} AS HUGEINT) & 4294967295) * CAST({b} AS HUGEINT))) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT)"
    ).format(a=a, b=b)


def _sql_mix64(v):
    """splitmix64 avalanche (functions/text.py _mix64) as a DuckDB
    expression over a UBIGINT operand (note DuckDB ^ is POWER; xor())."""
    s = "xor(%s, (%s >> 33))" % (v, v)
    s = _sql_mulmod64(s, "CAST('%d' AS UBIGINT)" % 0xFF51AFD7ED558CCD)
    s = "xor(%s, (%s >> 33))" % (s, s)
    s = _sql_mulmod64(s, "CAST('%d' AS UBIGINT)" % 0xC4CEB9FE1A85EC53)
    s = "xor(%s, (%s >> 33))" % (s, s)
    return s


# Shared normalized-text CTEs for every byte-gram hash oracle (MinHash,
# winnowing): ONE copy of the normalization spec, exactly mirroring
# functions/text.py shingle_windows_batch — DuckDB trim() strips spaces
# only (engine: .strip(" ")), RE2 \s+ is [\t\n\f\r ]+ (engine: the same
# explicit class), lower() is Unicode on both sides.
SQL_WATERMARK_LATE = _build_watermark_late_sql()


_NORM_NHX_CTES = r"""
norm AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS nt FROM documents
),
nhx AS (
  SELECT doc_id, hex(encode(nt)) AS hx, octet_length(encode(nt)) AS n FROM norm
),
"""


def _build_minhash_pair_ctes():
    """CTE chain re-deriving the FULL MinHash-LSH pipeline in DuckDB
    (oracle for q_minhash_pairs): normalized UTF-8 text → 5-BYTE shingle
    windows, each packed little-endian into uint64 XOR (byte_len << 56)
    — the injective window hash of functions/text.py
    ``shingle_windows_batch`` / ``char_shingles``, re-derived here by
    parsing hex(encode(nt)) byte pairs — → the exact mix64(x XOR seed)
    permutation family (the 64 seeds inlined from minhash_params(64,
    42)) → per-doc signatures → 16 4-perm bands with the engine's
    max_group=256 cap → candidate pairs → matching-permutation-fraction
    similarity."""
    from osm_export_tool_python_ray.functions.text import minhash_params

    seeds = minhash_params(64, 42)
    seed_vals = ", ".join(
        "(%d, CAST('%d' AS UBIGINT))" % (i, int(s)) for i, s in enumerate(seeds)
    )
    hexdig = "0123456789ABCDEF"
    win_le = _le64_expr("substr(hx, 2*i + 1, 10)", nbytes=5, digits=hexdig)
    short_le = _le64_expr("rpad(hx, 16, '0')", nbytes=8, digits=hexdig)
    return _NORM_NHX_CTES + r"""
shh AS (
  SELECT DISTINCT doc_id,
         xor({win_le}, CAST('{k_shift}' AS UBIGINT)) AS hv
  FROM nhx, UNNEST(range(0, n - 4)) r(i)
  WHERE n >= 5
  UNION
  SELECT DISTINCT doc_id,
         xor({short_le}, CAST(n AS UBIGINT) * CAST('72057594037927936' AS UBIGINT)) AS hv
  FROM nhx WHERE n BETWEEN 1 AND 4
),
seeds(perm, sd) AS (VALUES {seed_vals}),
sigs AS (
  SELECT doc_id, perm, min({mix}) AS sig FROM shh, seeds GROUP BY doc_id, perm
),
sigl0 AS (SELECT doc_id, list(sig ORDER BY perm) AS sg FROM sigs GROUP BY doc_id),
sigl AS (
  SELECT d.doc_id,
         coalesce(s.sg, (SELECT list(CAST('18446744073709551615' AS UBIGINT)) FROM range(64))) AS sg
  FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN sigl0 s ON s.doc_id = d.doc_id
),
bands AS (
  SELECT doc_id, b.b AS band, sg[4*b.b+1:4*b.b+4] AS bk, sg
  FROM sigl, range(16) b(b)
),
okg AS (SELECT band, bk FROM bands GROUP BY band, bk HAVING count(*) <= 256),
bx AS (SELECT bands.* FROM bands JOIN okg ON okg.band = bands.band AND okg.bk = bands.bk),
mh_cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sg AS sa, b.sg AS sb
  FROM bx a JOIN bx b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
)
""".format(
        win_le=win_le,
        short_le=short_le,
        k_shift=5 << 56,
        mix=_sql_mix64("xor(hv, sd)"),
        seed_vals=seed_vals,
    )


_MH_MATCHES = " + ".join(
    "(CASE WHEN sa[%d] = sb[%d] THEN 1 ELSE 0 END)" % (i, i) for i in range(1, 65)
)

SQL_MINHASH_PAIRS = (
    "WITH "
    + _build_minhash_pair_ctes()
    + "SELECT doc_a, doc_b, (%s) / 64.0 AS similarity FROM mh_cand WHERE (%s) / 64.0 >= 0.5"
    % (_MH_MATCHES, _MH_MATCHES)
)

def q_winnow_fingerprints(sf_dir):
    from osm_export_tool_python_ray.stages.textstages import winnow_fp

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(winnow_fp, batch_format="pyarrow")


def _build_winnow_sql(k=8, w=4):
    """Winnowing fingerprints re-derived in SQL: 8-byte gram hashes in
    position order (hex(encode(nt)) byte parsing → le64 pack XOR len<<56 →
    mix64, the same unseeded hash as functions/text.py
    winnow_fingerprints_batch), trailing window-min via a ROWS-frame
    window function, distinct minima at positions p ≥ w-1 or p = cnt-1
    (short docs: the last trailing window covers the whole doc)."""
    hexdig = "0123456789ABCDEF"
    win_le = _le64_expr("substr(hx, 2*i + 1, %d)" % (2 * k), nbytes=k, digits=hexdig)
    short_le = _le64_expr("rpad(hx, 16, '0')", nbytes=8, digits=hexdig)
    return "WITH " + _NORM_NHX_CTES + r"""
grams AS (
  SELECT doc_id, i AS pos, {mix_win} AS h
  FROM nhx, UNNEST(range(0, n - {km1})) r(i)
  WHERE n >= {k}
  UNION ALL
  SELECT doc_id, 0 AS pos, {mix_short} AS h
  FROM nhx WHERE n BETWEEN 1 AND {km1}
),
wins AS (
  SELECT doc_id, pos,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN {wm1} PRECEDING AND CURRENT ROW) AS wmin,
         count(*) OVER (PARTITION BY doc_id) AS cnt
  FROM grams
)
SELECT DISTINCT doc_id, wmin AS fp FROM wins WHERE pos >= {wm1} OR pos = cnt - 1
""".format(
        mix_win=_sql_mix64(
            "xor(%s, CAST('%d' AS UBIGINT))" % (win_le, k << 56)
        ),
        mix_short=_sql_mix64(
            "xor(%s, CAST(n AS UBIGINT) * CAST('72057594037927936' AS UBIGINT))"
            % short_le
        ),
        k=k,
        km1=k - 1,
        wm1=w - 1,
    )


SQL_WINNOW_FINGERPRINTS = _build_winnow_sql()


# connected components over the MinHash pair graph: recursive min-label CTE


def _cc_chain_sql(l0_body, steps=16, edges="edges"):
    """Connected-components min-label block for oracle SQL, WITHOUT a
    recursive CTE: ``steps`` chained MATERIALIZED rounds of
    (own ∪ neighbor-min ∪ pointer-jump) label relaxation. Pointer
    jumping (take the label OF my label) doubles propagation reach per
    round, so 16 rounds cover any component this side of 2^15 diameter —
    while the old ``walk`` recursion enumerated label-carrying PATHS and
    went quasi-quadratic on sf0.1's large near-dup clusters (observed:
    80+ CPU-minutes in DuckDB; this form runs in seconds). Returns
    (cte_sql, final_name); SELECT node, label FROM <final_name>."""
    # materialize the edge list ONCE: DuckDB inlines plain CTEs per
    # reference, so 16 chain steps would otherwise re-run the (possibly
    # expensive) upstream pair derivation 16 times
    parts = [
        "ccedges AS MATERIALIZED (SELECT a, b FROM %s)" % edges,
        "l0 AS MATERIALIZED (%s)" % l0_body,
    ]
    for k in range(1, steps + 1):
        parts.append(
            "l%d AS MATERIALIZED (SELECT node, min(label) AS label FROM ("
            "SELECT node, label FROM l%d"
            " UNION ALL SELECT e.b AS node, l.label FROM ccedges e"
            " JOIN l%d l ON l.node = e.a"
            " UNION ALL SELECT l2.node AS node, l3.label FROM l%d l2"
            " JOIN l%d l3 ON l3.node = l2.label"
            ") GROUP BY node)" % (k, k - 1, k - 1, k - 1, k - 1)
        )
    return ",\n".join(parts), "l%d" % steps


_CC_CHAIN, _CC_FINAL = _cc_chain_sql(
    "SELECT DISTINCT a AS node, a AS label FROM ccedges"
)
# grid-cell variant: seed labels from the CORE table so isolated cells
# (no 4-neighbors) still carry their singleton cluster label
_CC_CHAIN_CORE, _CC_FINAL_CORE = _cc_chain_sql(
    "SELECT cell AS node, cell AS label FROM core"
)


SQL_DEDUP_CLUSTERS = (
    "WITH "
    + _build_minhash_pair_ctes()
    + r""",
mh_pairs AS (
  SELECT doc_a, doc_b FROM mh_cand WHERE (%s) / 64.0 >= 0.5
),
edges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs UNION ALL SELECT doc_b, doc_a FROM mh_pairs),
"""
    % _MH_MATCHES
    + _CC_CHAIN
    + "\nSELECT node AS doc_id, label AS cluster_id FROM "
    + _CC_FINAL
)


def q_training_kept_docs(sf_dir):
    """The composed corpus-preparation pipeline as ONE oracle-backed
    query: exact dedup → near-dup representative filter (MinHash-LSH
    connected components; a doc survives iff it is its cluster's
    min-label representative or unclustered) → quality gates (lang_id
    == 'en', mean unigram logprob > -9 nats) → decontamination (docs
    sharing any 5-gram with the held-out benchmark slice are dropped;
    the slice itself — doc_id % 97 == 0 — is excluded from training
    outright via the inner join against the decontaminate output).

    Composition is SCALE-TRUE: all five per-doc stage outputs are keyed
    on doc_id and unique per key, so they are merged by ``multi_join``
    through a SINGLE doc_id-bucket exchange (flat light rows → the hash
    strategy via the width heuristic), then one vectorized filter — no
    driver-side sets, no per-pairwise-join re-shuffles of the same rows
    (contrast: examples/training_pipeline.py before round 4)."""
    from osm_export_tool_python_ray.stages.dedup import dedup_clusters, minhash_lsh_pairs
    from osm_export_tool_python_ray.stages.joins import multi_join

    base = q_exact_dedup(sf_dir)
    clusters = dedup_clusters(
        minhash_lsh_pairs(
            _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.5, num_buckets=16
        ),
        num_buckets=16,
    )
    i64 = pa.int64()
    joined = multi_join(
        base,
        pa.schema([("doc_id", i64), ("n_dups", i64)]),
        [
            (clusters, pa.schema([("doc_id", i64), ("cluster_id", i64)]), "left"),
            (q_lang_id(sf_dir), pa.schema([("doc_id", i64), ("lang_pred", pa.string())]), "inner"),
            (
                q_unigram_logprob(sf_dir),
                pa.schema([("doc_id", i64), ("n_alnum_tokens", i64), ("lp_micro", i64)]),
                "inner",
            ),
            (
                q_decontaminate(sf_dir),
                pa.schema([("doc_id", i64), ("n_overlap", i64), ("contaminated", pa.bool_())]),
                "inner",
            ),
        ],
        key="doc_id",
        num_buckets=16,
    )

    def gate(t: pa.Table) -> pa.Table:
        cid = t.column("cluster_id")
        rep = pc.or_kleene(pc.is_null(cid), pc.equal(cid, t.column("doc_id")))
        mask = pc.and_(
            pc.and_(
                pc.fill_null(rep, False),
                pc.equal(t.column("lang_pred"), "en"),
            ),
            pc.and_(
                pc.greater(t.column("lp_micro"), -9_000_000),
                pc.invert(t.column("contaminated")),
            ),
        )
        return t.filter(mask).select(
            ["doc_id", "n_dups", "lang_pred", "n_alnum_tokens", "lp_micro"]
        )

    return joined.map_batches(gate, batch_format="pyarrow").sort("doc_id")


def _build_training_kept_docs_sql():
    """The oracle composes the SAME SQL constants the stage oracles use
    (verbatim, as nested-WITH CTE bodies) — the composed query cannot
    drift from its parts."""
    return """
WITH exact AS ({exact}),
clusters AS (SELECT * FROM ({clusters}) __c),
lang AS ({lang}),
lp AS ({lp}),
decon AS ({decon})
SELECT e.doc_id, e.n_dups, l.lang_pred, p.n_alnum_tokens, p.lp_micro
FROM exact e
LEFT JOIN clusters c ON c.doc_id = e.doc_id
JOIN lang l ON l.doc_id = e.doc_id
JOIN lp p ON p.doc_id = e.doc_id
JOIN decon dc ON dc.doc_id = e.doc_id
WHERE (c.cluster_id IS NULL OR c.cluster_id = e.doc_id)
  AND l.lang_pred = 'en'
  AND p.lp_micro > -9000000
  AND NOT dc.contaminated
""".format(
        exact=SQL_EXACT_DEDUP,
        clusters=SQL_DEDUP_CLUSTERS,
        lang=SQL_LANG_ID,
        lp=SQL_UNIGRAM_LOGPROB,
        decon=SQL_DECONTAMINATE,
    )


SQL_TRAINING_KEPT_DOCS = _build_training_kept_docs_sql()


def q_textrank_keywords(sf_dir):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the top-200-term adjacent-co-occurrence graph, THREE
    integer-exact power iterations on Ray Data (each = one keyed join +
    one groupby over the ≤V² edge aggregate — stages/graph.py), top-20
    keywords by (score desc, term asc). The iterative-algorithm
    workload class: score mass flows along edges; all arithmetic int64
    micro-units with floor division so the oracle's chained-CTE
    iterations reproduce every score exactly."""
    from osm_export_tool_python_ray.stages.graph import textrank_scores

    return textrank_scores(
        lambda: _read(sf_dir, "documents", ["doc_id", "text"]), V=200, iters=3
    )


def _build_textrank_sql(V=200, iters=3):
    it_tpl = """
s{n} AS (
  SELECT t.term,
         CAST(150000 + coalesce(sum((85 * s.s * d.w) // (100 * wdeg.wd)), 0) AS BIGINT) AS s
  FROM topv t
  LEFT JOIN dir d ON d.dst = t.term
  LEFT JOIN s{p} s ON s.term = d.src
  LEFT JOIN wdeg ON wdeg.src = d.src
  GROUP BY t.term
)"""
    its = ",".join(it_tpl.format(n=i + 1, p=i) for i in range(iters))
    return r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents
),
allw AS (SELECT unnest(tk) AS term FROM toks),
agg AS (SELECT term, count(*) AS tf FROM allw GROUP BY term),
topv AS (SELECT term FROM agg ORDER BY tf DESC, term LIMIT %d),
pairs AS (
  SELECT tk[i] AS a, tk[i+1] AS b
  FROM toks, UNNEST(range(1, len(tk))) r(i)
  WHERE len(tk) >= 2
),
e0 AS (
  SELECT least(a, b) AS x, greatest(a, b) AS y, count(*) AS w
  FROM pairs
  WHERE a <> b AND a IN (SELECT term FROM topv) AND b IN (SELECT term FROM topv)
  GROUP BY 1, 2
),
dir AS (SELECT x AS src, y AS dst, w FROM e0 UNION ALL SELECT y AS src, x AS dst, w FROM e0),
wdeg AS (SELECT src, sum(w) AS wd FROM dir GROUP BY src),
s0 AS (SELECT term, CAST(1000000 AS BIGINT) AS s FROM topv),
%s
SELECT term, s AS score,
       row_number() OVER (ORDER BY s DESC, term ASC) AS rank
FROM s%d QUALIFY rank <= 20 ORDER BY rank
""" % (V, its, iters)


SQL_TEXTRANK_KEYWORDS = _build_textrank_sql()


# shared SQL body: word-3-gram sets, sizes, hot-gram cap (=the engine's
# max_gram_docs), Jaccard candidate pairs — the DuckDB twin of
# stages/dedup.py ngram_jaccard_pairs (which joins on 64-bit gram hashes;
# the oracle joins on the gram STRINGS, so a hash collision would show up
# as a mismatch here)
_NGRAM_PAIR_CTES = r"""
toks AS (
  SELECT doc_id, list_transform(regexp_extract_all(text, '\S+'), t -> lower(t)) AS tk
  FROM documents
),
grams_all AS (
  SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS gram
  FROM toks, UNNEST(range(1, len(tk) - 1)) AS r(i)
  WHERE len(tk) >= 3
  UNION ALL
  SELECT doc_id, array_to_string(tk, ' ') AS gram FROM toks WHERE len(tk) BETWEEN 1 AND 2
),
gset AS (SELECT DISTINCT doc_id, gram FROM grams_all),
sizes AS (SELECT doc_id, count(*) AS sz FROM gset GROUP BY doc_id),
ok_grams AS (SELECT gram FROM gset GROUP BY gram HAVING count(*) <= 64),
gk AS (SELECT g.doc_id, g.gram FROM gset g JOIN ok_grams o ON o.gram = g.gram),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM gk a JOIN gk b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
"""

SQL_NGRAM_JACCARD = (
    "WITH "
    + _NGRAM_PAIR_CTES
    + r"""
SELECT c.doc_a, c.doc_b,
       round(c.inter * 1.0 / (sa.sz + sb.sz - c.inter), 6) AS similarity
FROM cand c JOIN sizes sa ON sa.doc_id = c.doc_a JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE c.inter * 1.0 / (sa.sz + sb.sz - c.inter) >= 0.4
"""
)


def q_ngram_clusters(sf_dir):
    """Connected components over the EXACT n-gram-Jaccard pair graph —
    the oracle-backed companion to `dedup_clusters` (whose MinHash input
    is not SQL-expressible): DuckDB re-derives the same components with a
    recursive min-label CTE."""
    from osm_export_tool_python_ray.stages.dedup import dedup_clusters

    return dedup_clusters(q_ngram_jaccard(sf_dir), num_buckets=16).sort("doc_id")


SQL_NGRAM_CLUSTERS = (
    "WITH "
    + _NGRAM_PAIR_CTES
    + r""",
pairs AS (
  SELECT c.doc_a, c.doc_b FROM cand c
  JOIN sizes sa ON sa.doc_id = c.doc_a JOIN sizes sb ON sb.doc_id = c.doc_b
  WHERE c.inter * 1.0 / (sa.sz + sb.sz - c.inter) >= 0.4
),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION ALL SELECT doc_b, doc_a FROM pairs),
"""
    + _CC_CHAIN
    + "\nSELECT node AS doc_id, label AS cluster_id FROM "
    + _CC_FINAL
)


def q_dup_spans(sf_dir):
    """Span-level duplicate statistics (ExactSubstr-style, word-5-gram
    approximation): per doc, the maximal merged spans of n-gram windows
    whose gram occurs >= 2 times in the corpus. Integer token counts on
    both sides — no float in the compare surface."""
    from osm_export_tool_python_ray.stages.dedup import duplicate_spans

    return duplicate_spans(
        _read(sf_dir, "documents", ["doc_id", "text"]), n=5, num_buckets=32
    ).sort("doc_id")


# The oracle merges the SAME [pos, pos+w) windows with the classic
# gaps-and-islands pattern; it flags occurrences by gram STRING equality
# while the engine flags by the mix64-fold u64 key, so a key collision
# would surface here (as in decontaminate / ngram_jaccard).
SQL_DUP_SPANS = r"""
WITH toks AS (
  SELECT doc_id, list_transform(regexp_extract_all(text, '\S+'), s -> lower(s)) AS tk
  FROM documents
),
occ_all AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         array_to_string(tk[i:i+4], ' ') AS gram,
         CAST(i - 1 + 5 AS BIGINT) AS e
  FROM toks, UNNEST(range(1, len(tk) - 3)) AS r(i)
  WHERE len(tk) >= 5
  UNION ALL
  SELECT doc_id, 0, array_to_string(tk, ' '), len(tk)
  FROM toks WHERE len(tk) BETWEEN 1 AND 4
),
dup AS (SELECT gram FROM occ_all GROUP BY gram HAVING count(*) >= 2),
occ AS (SELECT o.doc_id, o.pos, o.e FROM occ_all o JOIN dup USING (gram)),
marked AS (
  SELECT doc_id, pos, e,
         CASE WHEN pos > coalesce(max(e) OVER (
                PARTITION BY doc_id ORDER BY pos, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS flag
  FROM occ
),
islands AS (
  SELECT doc_id, pos, e,
         sum(flag) OVER (PARTITION BY doc_id ORDER BY pos, e
                         ROWS UNBOUNDED PRECEDING) AS isl
  FROM marked
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_spans,
       CAST(sum(len) AS BIGINT) AS dup_tokens
FROM (SELECT doc_id, isl, max(e) - min(pos) AS len
      FROM islands GROUP BY doc_id, isl)
GROUP BY doc_id ORDER BY doc_id
"""


def q_source_overlap(sf_dir):
    """Pairwise source-vocabulary overlap matrix (corpus-curation
    diagnostic before mixing corpora): for every unordered source pair,
    the Jaccard similarity of their distinct token vocabularies.
    ``jaccard_micro`` is integer floor division on both sides — no
    float in the compare surface."""
    from osm_export_tool_python_ray.stages.dedup import source_overlap

    return source_overlap(
        _read(sf_dir, "documents", ["source", "text"])
    ).sort(["src_a", "src_b"])


# Tokens = text split on single spaces (string_split keeps empty tokens
# for runs of spaces — the engine's pc.split_pattern(" ") does the same,
# so the two sides agree on degenerate whitespace). Pair expansion in the
# engine happens per token group after a global (token, source) dedup;
# the oracle's self-join on token equality is the same set.
SQL_SOURCE_OVERLAP = """
WITH st AS (
  SELECT DISTINCT source, s AS tok
  FROM documents, UNNEST(string_split(text, ' ')) t(s)
),
cnt AS (SELECT source, count(*) AS n FROM st GROUP BY source),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.src_a, p.src_b, CAST(p.inter AS BIGINT) AS inter,
       CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
       CAST(p.inter * 1000000 // (ca.n + cb.n - p.inter) AS BIGINT)
         AS jaccard_micro
FROM pairs p
JOIN cnt ca ON ca.source = p.src_a
JOIN cnt cb ON cb.source = p.src_b
ORDER BY src_a, src_b
"""


# ------------------------------------------------------ sketches & retrieval

def q_hll_distinct(sf_dir):
    """HyperLogLog approximate distinct-token count (stages/sketch.py):
    64 registers, md5-le64 hash family, constant-size mergeable
    partials. Every output column is integer-exact — the harmonic
    denominator is a sum of powers of two published scaled by 2^53, and
    the raw-HLL estimate is an exact integer floor division — so the
    oracle reproduces the ESTIMATOR bit-for-bit, not just the inputs."""
    from osm_export_tool_python_ray.stages.sketch import hll_distinct_tokens

    return hll_distinct_tokens(_read(sf_dir, "documents", ["doc_id", "text"]))


def _build_hll_sql():
    from osm_export_tool_python_ray.stages.sketch import HLL_ALPHA_NUM

    h1 = _le64_expr("md5(tok)")
    return r"""
WITH toks AS (
  SELECT DISTINCT lower(s) AS tok
  FROM documents, UNNEST(regexp_extract_all(text, '\S+')) t(s)
),
h AS (SELECT {h1} AS h1 FROM toks),
rw AS (
  SELECT CAST(h1 // CAST('288230376151711744' AS UBIGINT) AS BIGINT) AS register,
         (h1 // CAST(64 AS UBIGINT)) % CAST('4503599627370496' AS UBIGINT) AS w
  FROM h
),
rk AS (
  SELECT register,
         CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END AS rank
  FROM rw
),
mx AS (SELECT register, max(rank) AS mr FROM rk GROUP BY register),
fullreg AS (
  SELECT g.r AS register, coalesce(mx.mr, 0) AS mr
  FROM range(64) g(r) LEFT JOIN mx ON mx.register = g.r
),
s AS (
  SELECT CAST(count(*) FILTER (WHERE mr > 0) AS BIGINT) AS nnz,
         CAST(sum(CAST(2.0 ** (53 - mr) AS BIGINT)) AS BIGINT) AS denom_scaled
  FROM fullreg
)
SELECT nnz, denom_scaled,
       CAST(CAST('{alpha}' AS HUGEINT)
            // (1000 * CAST(denom_scaled AS HUGEINT)) AS BIGINT) AS estimate
FROM s
""".format(h1=h1, alpha=HLL_ALPHA_NUM)


CMS_PROBES = ["window", "sort", "merge", "scan", "zzzneverseen"]


def q_cms_counts(sf_dir):
    """Count-Min point estimates for a fixed probe set (incl. one absent
    token, so the collision floor is part of the contract). Integer
    counters end to end; the oracle rebuilds the identical depth×width
    sketch — collisions and all — from the same double-hash family."""
    from osm_export_tool_python_ray.stages.sketch import cms_token_counts

    return cms_token_counts(
        _read(sf_dir, "documents", ["doc_id", "text"]), probes=CMS_PROBES
    )


def _build_cms_sql(depth=4, width=512):
    from osm_export_tool_python_ray.stages.sketch import CMS_DEPTH, CMS_WIDTH

    assert (depth, width) == (CMS_DEPTH, CMS_WIDTH)
    h1 = _le64_expr("hh")
    jh2 = _sql_mulmod64("CAST(j AS UBIGINT)", _le64_expr("substr(hh, 17, 16)"))
    cell = (
        "CAST(((CAST({h1} AS HUGEINT) + CAST({jh2} AS HUGEINT))"
        " % CAST('18446744073709551616' AS HUGEINT)) % {w} AS BIGINT)"
    ).format(h1=h1, jh2=jh2, w=width)
    probes = ", ".join("'%s'" % p for p in CMS_PROBES)
    return r"""
WITH occ AS (
  SELECT lower(s) AS tok
  FROM documents, UNNEST(regexp_extract_all(text, '\S+')) t(s)
),
tokc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c, md5(tok) AS hh
         FROM occ GROUP BY tok),
cells AS (
  SELECT j, {cell} AS b, sum(c) AS n
  FROM tokc, range({d}) r(j) GROUP BY 1, 2
),
ph AS (SELECT term, md5(lower(term)) AS hh
       FROM (SELECT unnest([{probes}]) AS term)),
pcell AS (SELECT term, j, {cell} AS b FROM ph, range({d}) r(j)),
est AS (
  SELECT p.term, min(coalesce(c2.n, 0)) AS est
  FROM pcell p LEFT JOIN cells c2 ON c2.j = p.j AND c2.b = p.b
  GROUP BY p.term
)
SELECT term, CAST(est AS BIGINT) AS est FROM est ORDER BY term
""".format(cell=cell, d=depth, probes=probes)


BM25_TERMS = ["window", "sort", "merge"]


def q_bm25_topk(sf_dir):
    """BM25 top-10 for a fixed 3-term query (stages/rank.py): one
    tokenize pass to a compact per-doc table, scalar corpus statistics,
    float64 scoring quantized to micro-units BEFORE ranking (ties on
    doc_id). The oracle mirrors the float64 expression shape term by
    term — constants written as the same source-level arithmetic
    ((1.2 + 1.0), (1.0 - 0.75 + ...)) so both sides fold to identical
    doubles."""
    from osm_export_tool_python_ray.stages.rank import bm25_topk

    return bm25_topk(
        _read(sf_dir, "documents", ["doc_id", "text"]), terms=BM25_TERMS, k=10
    )


def _build_bm25_sql():
    terms = BM25_TERMS
    tf_cols = ",\n         ".join(
        "len(list_filter(t, x -> x = '%s')) AS tf%d" % (t, j)
        for j, t in enumerate(terms)
    )
    dfs = ", ".join(
        "CAST(sum(CASE WHEN tf%d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df%d" % (j, j)
        for j in range(len(terms))
    )
    # fixed left-to-right accumulation, identical to the engine loop
    score = " + ".join(
        "ln(1.0 + (n - df{j} + 0.5) / (df{j} + 0.5))"
        " * (tf{j} * (1.2 + 1.0))"
        " / (tf{j} + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))".format(j=j)
        for j in range(len(terms))
    )
    anyhit = " OR ".join("tf%d > 0" % j for j in range(len(terms)))
    return r"""
WITH tk AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '\S+'), s -> lower(s)) AS t
  FROM documents
),
per AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
         {tf_cols}
  FROM tk
),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS s, {dfs}
  FROM per
),
sc AS (
  SELECT doc_id, ({score}) AS score
  FROM per, st, (SELECT CAST(s AS DOUBLE) / n AS avgdl FROM st) a
  WHERE {anyhit}
)
SELECT doc_id,
       {qr} AS score_micro,
       row_number() OVER (
         ORDER BY {qr} DESC, doc_id
       ) AS rank
FROM sc QUALIFY rank <= 10
""".format(tf_cols=tf_cols, dfs=dfs, score=score, anyhit=anyhit,
           qr=sql_qround("score * 1000000"))


DP_TOL2 = 9  # Douglas–Peucker tolerance² in grid units (tol = 3)


def q_trajectory_simplify(sf_dir):
    """Per-user Douglas–Peucker trajectory simplification
    (stages/journey.py trajectory_simplify): EXACT INTEGER DP — grid
    coords, cross² split metric, tie on smallest index — so the
    recursive-CTE oracle replays the identical rule with zero float
    tolerance. One user-keyed exchange; DP is sequential per polyline,
    parallel across users."""
    from osm_export_tool_python_ray.stages.journey import trajectory_simplify

    return trajectory_simplify(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]), tol2=DP_TOL2
    ).sort(["user_id", "idx"])


# The oracle replays DP as a recursive CTE: each live segment (lo, hi)
# computes its interior argmax of the integer split metric — packed as
# metric·2^20 + (2^20 − idx) so max() breaks metric ties on the SMALLEST
# idx (idx < 2^20 assumed; the engine has no such bound) — and splits
# while metric > tol²·len² (len²=1 for a degenerate zero-length chord,
# where the metric falls back to |p−a|²). Kept vertices = every lo/hi
# that ever appears, plus single-point users.
SQL_TRAJECTORY_SIMPLIFY = """
WITH RECURSIVE pts AS (
  SELECT user_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS idx,
         CAST(event_id % 100 AS BIGINT) AS x,
         CAST(floor(event_id / 7.0) AS BIGINT) % 100 AS y
  FROM events
),
npts AS (SELECT user_id, max(idx) AS n FROM pts GROUP BY user_id),
seg(user_id, lo, hi) AS (
  SELECT user_id, CAST(1 AS BIGINT), n FROM npts WHERE n >= 2
  UNION ALL
  SELECT spl.user_id, CAST(e.half[1] AS BIGINT), CAST(e.half[2] AS BIGINT)
  FROM (
    SELECT q.user_id, q.lo, q.hi,
           1048576 - (q.pack % 1048576) AS mid
    FROM (
      SELECT s.user_id, s.lo, s.hi,
             max(CASE WHEN (b.x - a.x)*(b.x - a.x) + (b.y - a.y)*(b.y - a.y) > 0
                      THEN ((b.x - a.x)*(p.y - a.y) - (b.y - a.y)*(p.x - a.x))
                         * ((b.x - a.x)*(p.y - a.y) - (b.y - a.y)*(p.x - a.x))
                      ELSE (p.x - a.x)*(p.x - a.x) + (p.y - a.y)*(p.y - a.y)
                 END * 1048576 + (1048576 - p.idx)) AS pack,
             CASE WHEN (any_value(b.x) - any_value(a.x))*(any_value(b.x) - any_value(a.x))
                     + (any_value(b.y) - any_value(a.y))*(any_value(b.y) - any_value(a.y)) > 0
                  THEN (any_value(b.x) - any_value(a.x))*(any_value(b.x) - any_value(a.x))
                     + (any_value(b.y) - any_value(a.y))*(any_value(b.y) - any_value(a.y))
                  ELSE 1 END AS len2
      FROM seg s
      JOIN pts a ON a.user_id = s.user_id AND a.idx = s.lo
      JOIN pts b ON b.user_id = s.user_id AND b.idx = s.hi
      JOIN pts p ON p.user_id = s.user_id AND p.idx > s.lo AND p.idx < s.hi
      GROUP BY s.user_id, s.lo, s.hi
    ) q
    WHERE q.pack // 1048576 > {tol2} * q.len2
  ) spl,
  LATERAL (SELECT unnest([[spl.lo, spl.mid], [spl.mid, spl.hi]]) AS half) e
)
SELECT user_id, idx FROM (
  SELECT user_id, lo AS idx FROM seg
  UNION
  SELECT user_id, hi FROM seg
  UNION
  SELECT user_id, 1 FROM npts WHERE n = 1
) ORDER BY user_id, idx
""".format(tol2=DP_TOL2)


# --------------------------------------------------------- corpus lexicals

GROWTH_THRESHOLDS = [64, 128, 256, 512, 1024, 4096]


def q_vocab_growth(sf_dir):
    """Heaps'-law vocabulary growth curve (stages/corpus.py): distinct
    tokens in {doc_id < N} per threshold N. First occurrence = MIN
    doc_id (a data property, parallelism-independent); the exchange
    moves batch-distinct token rows (vocabulary-scale combiner), each
    partition collapses to a ≤|thresholds|-row histogram."""
    from osm_export_tool_python_ray.stages.corpus import vocab_growth

    return vocab_growth(
        _read(sf_dir, "documents", ["doc_id", "text"]), thresholds=GROWTH_THRESHOLDS
    )


SQL_VOCAB_GROWTH = r"""
WITH firstocc AS (
  SELECT lower(s) AS tok, min(doc_id) AS d
  FROM documents, UNNEST(regexp_extract_all(text, '\S+')) t(s)
  GROUP BY tok
)
SELECT n AS threshold, CAST(count(*) FILTER (WHERE d < n) AS BIGINT) AS vocab_size
FROM firstocc, (SELECT unnest([{th}]) AS n) v
GROUP BY n ORDER BY n
""".format(th=", ".join(str(n) for n in GROWTH_THRESHOLDS))


def q_pmi_top(sf_dir):
    """Top-20 adjacent-bigram collocations by count with PMI
    (stages/corpus.py): integer-deterministic selection (count desc,
    bigram asc), one float64 PMI expression quantized floor-micro; the
    oracle mirrors the product order exactly."""
    from osm_export_tool_python_ray.stages.corpus import pmi_top

    return pmi_top(_read(sf_dir, "documents", ["doc_id", "text"]), k=20)


SQL_PMI_TOP = r"""
WITH tk AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '\S+'), s -> lower(s)) AS t
  FROM documents
),
bc AS (
  SELECT t[i] || ' ' || t[i + 1] AS bigram, CAST(count(*) AS BIGINT) AS n
  FROM tk, UNNEST(range(1, len(t))) r(i)
  WHERE len(t) >= 2
  GROUP BY 1
),
topb AS (SELECT bigram, n FROM bc ORDER BY n DESC, bigram ASC LIMIT 20),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(t) AS w FROM tk) GROUP BY w
),
tot AS (
  SELECT CAST(sum(len(t)) AS BIGINT) AS t_tot,
         CAST(sum(CASE WHEN len(t) >= 2 THEN len(t) - 1 ELSE 0 END) AS BIGINT) AS b_tot
  FROM tk
)
SELECT topb.bigram, topb.n,
       {QR_PMI} AS pmi_micro
FROM topb, tot
JOIN uni c1 ON c1.w = split_part(topb.bigram, ' ', 1)
JOIN uni c2 ON c2.w = split_part(topb.bigram, ' ', 2)
ORDER BY topb.n DESC, topb.bigram ASC
""".format(
    QR_PMI=sql_qround(
        "ln((CAST(topb.n AS DOUBLE) * t_tot * t_tot)"
        " / (CAST(b_tot AS DOUBLE) * c1.c * c2.c)) * 1000000.0"
    )
)


# ------------------------------------------------------------ user journeys

FUNNEL_STAGES = ["signup", "click", "purchase"]


def q_funnel(sf_dir):
    """Ordered-funnel progression (stages/journey.py): users completing
    signup < click < purchase at strictly increasing event timestamps.
    One user-keyed exchange, |stages| partial rows per partition, pure
    int64 microsecond comparisons — no floats in the semantics."""
    from osm_export_tool_python_ray.stages.journey import funnel_progression

    return funnel_progression(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]),
        stages=FUNNEL_STAGES,
    )


SQL_FUNNEL = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = '{s0}' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = '{s1}' AND e.ts > t1.t GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = '{s2}' AND e.ts > t2.t GROUP BY e.user_id
)
SELECT 1 AS stage, CAST(count(*) AS BIGINT) AS users FROM t1
UNION ALL SELECT 2, CAST(count(*) AS BIGINT) FROM t2
UNION ALL SELECT 3, CAST(count(*) AS BIGINT) FROM t3
ORDER BY stage
""".format(s0=FUNNEL_STAGES[0], s1=FUNNEL_STAGES[1], s2=FUNNEL_STAGES[2])


def q_trajectory(sf_dir):
    """Per-user trajectory statistics over the deterministic synthetic
    event points (the _customer_points family on event_id), ordered by
    (ts, event_id): total planar path length and net first→last
    displacement, quantized per SEGMENT to int64 nano-degree units
    before summing (summation-order independence; IEEE mult/add/sqrt
    are correctly rounded, so numpy and DuckDB agree bit-for-bit)."""
    from osm_export_tool_python_ray.stages.journey import trajectory_stats

    return trajectory_stats(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    ).sort("user_id")


SQL_TRAJECTORY = """
WITH pts AS (
  SELECT user_id, ts, event_id,
         (event_id % 100) * 0.01 AS lon,
         (CAST(floor(event_id / 7.0) AS BIGINT) % 100) * 0.01 AS lat
  FROM events
),
seg AS (
  SELECT user_id,
         lon - lag(lon) OVER w AS dx,
         lat - lag(lat) OVER w AS dy
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
path AS (
  SELECT user_id,
         CAST(coalesce(sum(CAST(floor(sqrt(dx * dx + dy * dy)
              * 1000000000.0 + 0.5) AS BIGINT)), 0) AS BIGINT) AS path_micro
  FROM seg GROUP BY user_id
),
fl AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         first(lon ORDER BY ts, event_id) AS lon0,
         first(lat ORDER BY ts, event_id) AS lat0,
         last(lon ORDER BY ts, event_id) AS lon1,
         last(lat ORDER BY ts, event_id) AS lat1
  FROM pts GROUP BY user_id
)
SELECT fl.user_id, n_events, path_micro,
       CAST(floor(sqrt((lon1 - lon0) * (lon1 - lon0)
            + (lat1 - lat0) * (lat1 - lat0)) * 1000000000.0 + 0.5)
            AS BIGINT) AS net_micro
FROM fl JOIN path ON fl.user_id = path.user_id
ORDER BY fl.user_id
"""


# --------------------------------------------------------------- embeddings

def _query_vectors(sf_dir, n=4):
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    m = np.array(t.column("embedding").to_pylist()[:n], dtype=np.float64)
    ids = t.column("vec_id").to_pylist()[:n]
    return m, ids


def q_ann_topk(sf_dir):
    from osm_export_tool_python_ray.stages.ann import ann_topk

    qm, qids = _query_vectors(sf_dir, 4)
    out = ann_topk(_read(sf_dir, "embeddings"), qm, qids, k=10)
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("cos_sim"), "cos_sim", pc.round(t.column("cos_sim"), 6)
        ),
        batch_format="pyarrow",
    )


SQL_ANN_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id IN (0,1,2,3)),
ranked AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim,
         row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id
         ) - 1 AS rank
  FROM q CROSS JOIN embeddings e
)
SELECT query_id, vec_id, cos_sim, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank < 10
"""


def q_embedding_near_dup(sf_dir):
    from osm_export_tool_python_ray.stages.ann import embedding_near_dup

    out = embedding_near_dup(
        _read(sf_dir, "embeddings"), threshold=0.4, num_planes=4, num_buckets=16
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("similarity"), "similarity", pc.round(t.column("similarity"), 5)
        ),
        batch_format="pyarrow",
    )


def q_embedding_kmeans(sf_dir):
    """Nearest-centroid assignment with the SQL-re-derivable strided
    sample init and ZERO Lloyd iterations — the oracle derives identical
    centroids from the table (rank + position formula) so assignments are
    value-exact. The Lloyd refinement loop itself is iterative (not SQL-
    expressible) and is pinned by pytest instead (planted-blob recovery,
    inertia decrease, two-parallelism determinism)."""
    from osm_export_tool_python_ray.stages.ann import embedding_kmeans

    return embedding_kmeans(
        _read(sf_dir, "embeddings"), k=8, iters=0, init="strided"
    ).sort("vec_id")


SQL_EMBEDDING_KMEANS = """
WITH samp AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         row_number() OVER (ORDER BY vec_id) - 1 AS rn
  FROM embeddings ORDER BY vec_id LIMIT 2048
),
cnt AS (SELECT count(*) AS n FROM samp),
cents AS (
  SELECT i.i AS cidx, s.v AS cv
  FROM range(8) i(i), cnt, samp s
  WHERE s.rn = least((i.i * cnt.n) // 8, cnt.n - 1)
),
d AS (
  SELECT e.vec_id, c.cidx,
         list_distance(CAST(e.embedding AS DOUBLE[]), c.cv) AS dist,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv) ASC, c.cidx ASC
         ) AS r
  FROM embeddings e CROSS JOIN cents c
)
SELECT vec_id, CAST(cidx AS INTEGER) AS cluster FROM d WHERE r = 1 ORDER BY vec_id
"""


def q_ivf_topk(sf_dir):
    """IVF probe + assignment pipeline with the SQL-re-derivable strided
    centroids and no refinement (float64) — the full inverted-file path
    (assign vectors to nearest centroid, probe nprobe centroids per
    query, per-query top-k over candidates) is value-exact against the
    oracle. The seeded/Lloyd-refined init stays available
    (ivf_topk(init="seeded")) with pytest recall coverage."""
    from osm_export_tool_python_ray.stages.ann import ivf_topk

    qm, qids = _query_vectors(sf_dir, 4)
    out = ivf_topk(
        _read(sf_dir, "embeddings"), qm, qids, k=5, init="strided", refine_iters=0
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("cos_sim"), "cos_sim", pc.round(t.column("cos_sim"), 5)
        ),
        batch_format="pyarrow",
    )


SQL_IVF_TOPK = """
WITH samp AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         row_number() OVER (ORDER BY vec_id) - 1 AS rn
  FROM embeddings ORDER BY vec_id LIMIT 2048
),
cnt AS (SELECT count(*) AS n FROM samp),
cents AS (
  SELECT i.i AS cidx,
         list_transform(s.v, x -> x / greatest(sqrt(list_dot_product(s.v, s.v)), 1e-12)) AS cn
  FROM range(64) i(i), cnt, samp s
  WHERE s.rn = least((i.i * cnt.n) // 64, cnt.n - 1)
),
nv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> x / greatest(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 1e-12)) AS nv
  FROM embeddings
),
assign AS (
  SELECT vec_id, cidx FROM (
    SELECT e.vec_id, c.cidx,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.nv, c.cn) DESC, c.cidx ASC
           ) AS r
    FROM nv e CROSS JOIN cents c
  ) WHERE r = 1
),
probe AS (
  SELECT query_id, cidx FROM (
    SELECT q.vec_id AS query_id, c.cidx,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_dot_product(q.nv, c.cn) DESC, c.cidx ASC
           ) AS r
    FROM nv q CROSS JOIN cents c
    WHERE q.vec_id IN (0,1,2,3)
  ) WHERE r <= 8
),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM probe p JOIN assign a ON a.cidx = p.cidx
),
ranked AS (
  SELECT c.query_id, c.vec_id,
         round(list_dot_product(q.nv, e.nv), 5) AS cos_sim,
         row_number() OVER (
           PARTITION BY c.query_id
           ORDER BY list_dot_product(q.nv, e.nv) DESC, c.vec_id ASC
         ) - 1 AS rank
  FROM cand c
  JOIN nv e ON e.vec_id = c.vec_id
  JOIN nv q ON q.vec_id = c.query_id
)
SELECT query_id, vec_id, cos_sim, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank < 5
"""


def q_pq_codes(sf_dir):
    """Product-quantization compression codes (stages/ann.py pq_codes):
    4 subspaces × 16 strided centroids over the 64-dim embeddings —
    the storage representation of a web-scale ANN corpus. Codebook
    broadcast, zero shuffles; oracle re-derives the identical codebook
    (rank+position formula) and argmin via window ranking over sliced
    list_distance."""
    from osm_export_tool_python_ray.stages.ann import pq_codes

    return pq_codes(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), m=4, k=16
    ).sort(["vec_id", "sub"])


SQL_PQ_CODES = """
WITH samp AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         row_number() OVER (ORDER BY vec_id) - 1 AS rn
  FROM embeddings ORDER BY vec_id LIMIT 2048
),
cnt AS (SELECT count(*) AS n FROM samp),
cents AS (
  SELECT i.i AS cidx, s.v AS cv
  FROM range(16) i(i), cnt, samp s
  WHERE s.rn = least((i.i * cnt.n) // 16, cnt.n - 1)
),
subc AS (
  SELECT sub.s AS sub, c.cidx,
         c.cv[sub.s * 16 + 1 : sub.s * 16 + 16] AS scv
  FROM range(4) sub(s), cents c
),
d AS (
  SELECT e.vec_id, sc.sub, sc.cidx,
         row_number() OVER (
           PARTITION BY e.vec_id, sc.sub
           ORDER BY list_distance(
             CAST(e.embedding AS DOUBLE[])[sc.sub * 16 + 1 : sc.sub * 16 + 16],
             sc.scv) ASC, sc.cidx ASC
         ) AS r
  FROM embeddings e CROSS JOIN subc sc
)
SELECT vec_id, CAST(sub AS INTEGER) AS sub, CAST(cidx AS INTEGER) AS code
FROM d WHERE r = 1 ORDER BY vec_id, sub
"""


def q_pq_topk(sf_dir):
    """ADC search over PQ codes (stages/ann.py pq_adc_topk): the search
    half of product quantization — per-query (m × k) integer distance
    tables, per-vector m table lookups, tiny top-k combiner. Fully
    int64 (1e-4 sub-unit quantization BEFORE any distance) so ranking
    is bit-identical to the oracle with no float-ranking risk."""
    from osm_export_tool_python_ray.stages.ann import pq_adc_topk

    return pq_adc_topk(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        query_ids=[0, 1, 2, 3],
        m=4,
        k=16,
        topk=5,
    )


SQL_PQ_TOPK = """
WITH eq AS (
  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dj,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000 + 0.5)
              AS BIGINT) AS qv
  FROM embeddings
),
samp AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS rn
  FROM embeddings ORDER BY vec_id LIMIT 2048
),
cnt AS (SELECT count(*) AS n FROM samp),
cpos AS (
  SELECT i.i AS cidx, s.vec_id
  FROM range(16) i(i), cnt, samp s
  WHERE s.rn = least((i.i * cnt.n) // 16, cnt.n - 1)
),
cq AS (SELECT p.cidx, e.dj, e.qv FROM cpos p JOIN eq e ON e.vec_id = p.vec_id),
dist AS (
  SELECT e.vec_id, e.dj // 16 AS sub, c.cidx,
         CAST(sum((e.qv - c.qv) * (e.qv - c.qv)) AS BIGINT) AS d2
  FROM eq e JOIN cq c ON c.dj = e.dj
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, sub, cidx FROM (
    SELECT vec_id, sub, cidx,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY d2 ASC, cidx ASC) AS r
    FROM dist
  ) WHERE r = 1
),
adc AS (
  SELECT qd.vec_id AS query_id, c.vec_id, CAST(sum(qd.d2) AS BIGINT) AS adc
  FROM codes c JOIN dist qd ON qd.sub = c.sub AND qd.cidx = c.cidx
  WHERE qd.vec_id IN (0, 1, 2, 3)
  GROUP BY 1, 2
)
SELECT query_id, vec_id, adc,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY adc ASC, vec_id ASC) AS rank
FROM adc QUALIFY rank <= 5
"""


def q_gram_matrix(sf_dir):
    """Distributed PCA sufficient statistics (stages/ann.py gram_stats):
    exact integer Gram matrix + per-dim sums + count over the embedding
    column, quantized to 1e-4 sub-units before any product so every
    statistic is integer-exact and summation-order independent. Each
    task emits constant d^2-sized partials; the driver-side eigen finish
    (pca_from_gram) is pytest-covered."""
    from osm_export_tool_python_ray.stages.ann import gram_stats

    return gram_stats(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ).sort(["dj", "dk"])


SQL_GRAM_MATRIX = """
WITH q AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dj,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000 + 0.5)
              AS BIGINT) AS qv
  FROM embeddings
)
SELECT a.dj AS dj, b.dj AS dk, CAST(sum(a.qv * b.qv) AS BIGINT) AS v
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.dj <= b.dj
GROUP BY 1, 2
UNION ALL
SELECT dj, CAST(-1 AS BIGINT), CAST(sum(qv) AS BIGINT) FROM q GROUP BY dj
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), count(*) FROM embeddings
ORDER BY dj, dk
"""


# ------------------------------------------------------------- relational

def q_q1_lineitem(sf_dir):
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(t: pa.Table) -> pa.Table:
        # per-row revenue quantized to integer CENTS before the sum: the
        # grouped totals are then summation-order independent (Ray's
        # partial folds vs DuckDB's parallel sum would otherwise disagree
        # in the last ulp at a rounding boundary). Same association order
        # as the oracle: (price * (1 - discount)) * 100.
        px = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev_c = np.floor(px * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        return t.append_column("rev_c", pa.array(rev_c))

    out = (
        ds.map_batches(revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("rev_c", alias_name="rev_c"),
            Count(alias_name="n"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        rev = t.column("rev_c").to_numpy(zero_copy_only=False) / 100.0
        return (
            t.drop_columns(["rev_c"])
            .append_column("revenue", pa.array(rev))
            .set_column(
                t.schema.get_field_index("sum_qty"),
                "sum_qty",
                pc.round(t.column("sum_qty"), 2),
            )
        )

    return out.map_batches(finish, batch_format="pyarrow")


SQL_Q1_LINEITEM = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS DOUBLE) / 100 AS revenue,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_top_orders(sf_dir):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    # deterministic top-k: sort by (price desc, key asc)
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_customer_orders_join(sf_dir):
    from ray.data.aggregate import Count

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = orders.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )
    return j.groupby("c_mktsegment").aggregate(Count(alias_name="n"))


SQL_CUSTOMER_ORDERS_JOIN = """
SELECT c_mktsegment, count(*) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_supplier_nation_region(sf_dir):
    """Two-level dimension join (supplier⋈nation⋈region) + groupby —
    exercises chained primitive hash joins."""
    from ray.data.aggregate import Count

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"])

    def widen(t: pa.Table) -> pa.Table:  # align int32 keys for the join
        cols = {}
        for name in t.schema.names:
            col = t.column(name)
            cols[name] = col.cast(pa.int64()) if pa.types.is_integer(col.type) else col
        return pa.table(cols)

    sup, nat, reg = (d.map_batches(widen, batch_format="pyarrow") for d in (sup, nat, reg))
    j = sup.join(nat, join_type="inner", num_partitions=4, on=("s_nationkey",), right_on=("n_nationkey",))
    j = j.join(reg, join_type="inner", num_partitions=4, on=("n_regionkey",), right_on=("r_regionkey",))
    return j.groupby("r_name").aggregate(Count(alias_name="n"))


SQL_SUPPLIER_NATION_REGION = """
SELECT r_name, count(*) AS n
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_part_stats(sf_dir):
    from ray.data.aggregate import Count, Mean

    out = (
        _read(sf_dir, "part", ["p_brand", "p_retailprice"])
        .groupby("p_brand")
        .aggregate(Count(alias_name="n"), Mean("p_retailprice", alias_name="avg_price"))
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("avg_price"), "avg_price", pc.round(t.column("avg_price"), 4)
        ),
        batch_format="pyarrow",
    )


SQL_PART_STATS = """
SELECT p_brand, count(*) AS n, round(avg(p_retailprice), 4) AS avg_price
FROM part GROUP BY p_brand
"""


def q_events_window(sf_dir):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def hour(t: pa.Table) -> pa.Table:
        return t.append_column("hour_ts", pc.floor_temporal(t.column("ts"), unit="hour"))

    out = (
        ds.map_batches(hour, batch_format="pyarrow")
        .groupby(["event_type", "hour_ts"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("sum_value"), "sum_value", pc.round(t.column("sum_value"), 4)
        ),
        batch_format="pyarrow",
    )


SQL_EVENTS_WINDOW = """
SELECT event_type, date_trunc('hour', ts) AS hour_ts,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def q_events_sliding(sf_dir):
    """SLIDING windowed aggregate (vs q_events_window's tumbling): per
    event_type and hour, the trailing 3-hour sum/count of values —
    time-RANGE semantics (missing hours contribute nothing but do not
    shift the window, unlike a ROWS frame). Combiner-shaped: raw events
    collapse to hourly partials per batch, the one exchange moves only
    (type, hour) rows, and each group computes the sliding sums with a
    cumsum + searchsorted over its sorted hour axis."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map

    HOUR = 3_600_000_000  # us

    HBIAS = np.int64(1) << np.int64(39)  # pre-1970 ts → negative hour index

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        h = (
            t.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ).astype(np.int64) // HOUR + HBIAS  # biased into [0, 2^40)
        # per-row values quantized to int 1e-4 sub-units BEFORE any sum:
        # integer partials make the windowed sums summation-ORDER
        # independent on both sides (DuckDB's parallel sum folds floats in
        # nondeterministic order — a rounding-boundary value could flip
        # the driver hash). floor(x*1e4+0.5) is the same half-up rule the
        # oracle applies; the final division by 1e4 is exact-grid, so no
        # output round() (and no half-even-vs-half-away divergence) at all.
        v = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 1e4 + 0.5
        ).astype(np.int64)
        types, inv = np.unique(et, return_inverse=True)
        key = inv.astype(np.int64) << np.int64(40) | h  # biased hour < 2^40
        ukey, pos = np.unique(key, return_inverse=True)
        cnt = np.bincount(pos)
        # exact int64 accumulation (np.add.at): bincount(weights=) sums
        # through FLOAT64 and would re-break order independence past 2^53
        # sub-units — the exact bound this quantization exists to remove
        sv = np.zeros(len(ukey), dtype=np.int64)
        np.add.at(sv, pos, v)
        ti = (ukey >> np.int64(40)).astype(np.int64)
        from osm_export_tool_python_ray.stages.exchange import hash_bucket

        tb = hash_bucket(pa.array(types, type=pa.string()), 8)
        return pa.table(
            {
                "event_type": pa.array(types[ti], type=pa.string()),
                "hour": pa.array(ukey & np.int64((1 << 40) - 1)),
                "n": pa.array(cnt.astype(np.int64)),
                "sum_v": pa.array(sv),
                "bucket": pa.array(tb[ti]),
            }
        )

    def sliding(g: pa.Table) -> pa.Table:
        g = g.sort_by([("event_type", "ascending"), ("hour", "ascending")])
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        h = g.column("hour").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        sv = g.column("sum_v").to_numpy(zero_copy_only=False)
        out = {"event_type": [], "hour_ts": [], "n_3h": [], "sum_3h": []}
        if len(et) == 0:
            return pa.table(
                {
                    "event_type": pa.array([], type=pa.string()),
                    "hour_ts": pa.array([], type=pa.timestamp("us")),
                    "n_3h": pa.array([], type=pa.int64()),
                    "sum_3h": pa.array([], type=pa.float64()),
                }
            )
        starts = np.nonzero(np.concatenate(([True], et[1:] != et[:-1])))[0]
        ends = np.append(starts[1:], len(et))
        for s, e in zip(starts, ends):
            # the exchange may deliver duplicate (type, hour) partial rows
            # (one per producing batch): fold them before the window
            uh, pos = np.unique(h[s:e], return_inverse=True)
            un = np.zeros(len(uh), dtype=np.int64)
            np.add.at(un, pos, n[s:e])
            usv = np.zeros(len(uh), dtype=np.int64)
            np.add.at(usv, pos, sv[s:e])
            cum_n = np.concatenate(([0], np.cumsum(un)))
            cum_v = np.concatenate(([0], np.cumsum(usv)))
            hi = np.arange(1, len(uh) + 1)
            lo = np.searchsorted(uh, uh - 2, side="left")  # trailing 3 hours
            out["event_type"].extend([et[s]] * len(uh))
            out["hour_ts"].extend(((uh - HBIAS) * HOUR).tolist())
            out["n_3h"].extend((cum_n[hi] - cum_n[lo]).tolist())
            # integer sub-unit sums divided back on the exact 1e-4 grid
            out["sum_3h"].extend(((cum_v[hi] - cum_v[lo]) / 1e4).tolist())
        return pa.table(
            {
                "event_type": pa.array(out["event_type"], type=pa.string()),
                "hour_ts": pa.array(
                    np.array(out["hour_ts"], dtype=np.int64).astype("datetime64[us]")
                ),
                "n_3h": pa.array(out["n_3h"], type=pa.int64()),
                "sum_3h": pa.array(out["sum_3h"], type=pa.float64()),
            }
        )

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return grouped_map(ds, "bucket", sliding, num_partitions=8)


SQL_EVENTS_SLIDING = """
WITH hourly AS (
  -- per-row int 1e-4 sub-unit quantization before ANY sum: matches the
  -- engine's integer partials, summation-order independent
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         count(*) AS n,
         sum(CAST(floor(value * 1e4 + 0.5) AS BIGINT)) AS sum_v
  FROM events GROUP BY event_type, date_trunc('hour', ts)
)
SELECT event_type, hour_ts,
       CAST(sum(n) OVER w AS BIGINT) AS n_3h,  -- window sum is HUGEINT
       CAST(sum(sum_v) OVER w AS DOUBLE) / 1e4 AS sum_3h
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
             RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW)
"""


def q_events_sessions(sf_dir):
    """Sessionization (streaming-shaped op): events partitioned by user,
    sorted by ts within the partition, split at >30-minute gaps. Per
    session: user_id, session_start, n_events, sum_value. The ordering
    assumption (ts order within each user partition) is established by the
    in-group sort — Ray Data has no event-time watermarks (guide §streaming).
    """
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def bucketer(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((u % 32).astype(np.int32)))

    def sessions(g: pa.Table) -> pa.Table:
        # Arrow/numpy-native sessionizer (no pandas round-trip): sorted
        # (user, ts) → gap/new-user boundaries → reduceat aggregates
        g = g.drop_columns(["bucket"]).sort_by(
            [("user_id", "ascending"), ("ts", "ascending")]
        )
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        if len(u) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], type=g.schema.field("user_id").type),
                    "session_start": pa.array([], type=g.schema.field("ts").type),
                    "n_events": pa.array([], type=pa.int64()),
                    "sum_value": pa.array([], type=pa.float64()),
                }
            )
        tsi = (
            g.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[ns]")
            .astype(np.int64)
        )
        # int 1e-4 sub-units before the per-session sum (order independence
        # — see q_events_sliding); the /1e4 below is exact-grid, no round()
        v = np.floor(
            g.column("value").to_numpy(zero_copy_only=False) * 1e4 + 0.5
        ).astype(np.int64)
        new = np.ones(len(u), dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | ((tsi[1:] - tsi[:-1]) > 30 * 60 * 1_000_000_000)
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(u))
        ts_col = g.column("ts")
        if isinstance(ts_col, pa.ChunkedArray):
            ts_col = ts_col.combine_chunks()
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "session_start": ts_col.take(pa.array(starts)),
                "n_events": pa.array((ends - starts).astype(np.int64)),
                "sum_value": pa.array(np.add.reduceat(v, starts) / 1e4),
            }
        )

    from osm_export_tool_python_ray.stages.exchange import grouped_map

    return grouped_map(
        ds.map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        sessions,
        num_partitions=16,
    )


SQL_EVENTS_SESSIONS = """
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
       CAST(sum(CAST(floor(value * 1e4 + 0.5) AS BIGINT)) AS DOUBLE) / 1e4
         AS sum_value
FROM numbered GROUP BY user_id, sid
"""


def q_scd2(sf_dir):
    """SCD-type-2 state history (stages/temporal.py scd2_intervals):
    per user, collapse the ordered event stream into event_type validity
    intervals — valid_from = run start ts, valid_to = next run's start
    (null for the open run). Explicit (ts, event_id) ordering makes
    equal-timestamp events deterministic on both sides."""
    from osm_export_tool_python_ray.stages.temporal import scd2_intervals

    return scd2_intervals(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    ).sort(["user_id", "valid_from"])


SQL_SCD2 = """
WITH ord AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
                   OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS rid
  FROM ord
),
agg AS (
  SELECT user_id, rid, any_value(event_type) AS state,
         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
  FROM runs GROUP BY user_id, rid
)
SELECT user_id, state, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY rid)
         AS valid_to,
       n_events
FROM agg
ORDER BY user_id, valid_from
"""


def q_time_travel(sf_dir):
    """Point-in-time snapshot read (time travel): per-user state AS OF
    2024-01-15T12:00:00Z reconstructed from the SCD2 validity-interval
    history — the interval containing T (valid_from ≤ T < valid_to, open
    intervals unbounded). The read-side complement of q_scd2: history
    build streams once, any number of AS-OF cuts are then a vectorized
    filter, no re-scan of the raw events."""
    import pyarrow.compute as pc

    from osm_export_tool_python_ray.stages.temporal import scd2_intervals

    T = 1705320000000000  # 2024-01-15 12:00:00 UTC in epoch-us

    hist = scd2_intervals(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    )

    def asof_cut(t: pa.Table) -> pa.Table:
        vf = t.column("valid_from").cast(pa.int64())
        vt = t.column("valid_to").cast(pa.int64())
        # open intervals: valid_to null → matches any later T
        # (fill_null(True), since plain or_ is not Kleene and would
        # propagate the null through the filter, dropping the row)
        keep = pc.and_(
            pc.less_equal(vf, T),
            pc.fill_null(pc.greater(vt, T), True),
        )
        t = t.filter(keep)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "state": t.column("state"),
                "valid_from": t.column("valid_from"),
                "n_events": t.column("n_events"),
            }
        )

    return hist.map_batches(asof_cut, batch_format="pyarrow").sort("user_id")


SQL_TIME_TRAVEL = """
WITH ord AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
                   OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS rid
  FROM ord
),
agg AS (
  SELECT user_id, rid, any_value(event_type) AS state,
         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
  FROM runs GROUP BY user_id, rid
),
hist AS (
  SELECT user_id, state, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY rid)
           AS valid_to,
         n_events
  FROM agg
)
SELECT user_id, state, valid_from, n_events
FROM hist
WHERE epoch_us(valid_from) <= 1705320000000000
  AND (valid_to IS NULL OR epoch_us(valid_to) > 1705320000000000)
ORDER BY user_id
"""


def q_gap_fill(sf_dir):
    """Time-series resample + LOCF gap fill (stages/temporal.py
    gap_fill_locf): per user, hourly int-micro-unit value sums expanded
    to a dense hour grid between the user's first and last observation,
    missing hours carrying the last observed sum forward. Combiner
    collapses events to (user, hour) partials before the one keyed
    exchange; all compare-surface arithmetic is int64."""
    from osm_export_tool_python_ray.stages.temporal import gap_fill_locf

    return gap_fill_locf(
        _read(sf_dir, "events", ["user_id", "ts", "value"])
    ).sort(["user_id", "hr"])


SQL_GAP_FILL = """
WITH obs AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS hr,
         sum(CAST(floor(value * 1e4 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT user_id, min(hr) AS h0, max(hr) AS h1 FROM obs GROUP BY 1
),
grid AS (
  SELECT s.user_id, s.h0 + i AS hr
  FROM spans s, UNNEST(range(0, s.h1 - s.h0 + 1)) t(i)
),
joined AS (
  SELECT g.user_id, g.hr, o.v,
         CASE WHEN o.hr IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.hr = g.hr
)
SELECT user_id, hr,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY hr
         ROWS UNBOUNDED PRECEDING) AS v_q,
       CAST(observed AS BIGINT) AS observed
FROM joined
ORDER BY user_id, hr
"""


PROFILE_SPEC = [
    ("l_orderkey", "int"), ("l_partkey", "int"), ("l_suppkey", "int"),
    ("l_linenumber", "int"), ("l_quantity", "cents"),
    ("l_extendedprice", "cents"), ("l_discount", "cents"),
    ("l_tax", "cents"), ("l_returnflag", "str"), ("l_linestatus", "str"),
    ("l_shipdate", "ts_us"),
]


def q_table_profile(sf_dir):
    """Column profiling / catalog stats (stages/profile.py
    profile_table): exact null count, exact NDV, min and max for every
    lineitem column in ONE scan — per-batch-deduped (col, repr) pairs
    through one hash-bucketed exchange, so global NDV is a sum of
    per-partition distinct counts. Reprs are canonical strings
    (zero-padded ints / cents / epoch-us) so lexicographic min/max is
    numeric-order correct on both sides."""
    from osm_export_tool_python_ray.stages.profile import profile_table

    return profile_table(
        _read(sf_dir, "lineitem", [c for c, _ in PROFILE_SPEC]),
        PROFILE_SPEC,
    ).sort("col")


def _build_table_profile_sql():
    parts = []
    for name, kind in PROFILE_SPEC:
        if kind == "int":
            expr = name
        elif kind == "cents":
            expr = "CAST(floor(%s * 100 + 0.5) AS BIGINT)" % name
        elif kind == "ts_us":
            expr = "epoch_us(%s)" % name
        else:
            expr = None
        if expr is None:  # raw string column
            mn, mx = "min(%s)" % name, "max(%s)" % name
        else:
            mn = "lpad(CAST(min(%s) AS VARCHAR), 20, '0')" % expr
            mx = "lpad(CAST(max(%s) AS VARCHAR), 20, '0')" % expr
        parts.append(
            "SELECT '%s' AS col, count(*) - count(%s) AS n_nulls,\n"
            "       count(DISTINCT %s) AS n_distinct,\n"
            "       %s AS min_v, %s AS max_v\nFROM lineitem"
            % (name, name, name, mn, mx)
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col"


SQL_TABLE_PROFILE = _build_table_profile_sql()


CHECKSUM_TABLES = [
    ("documents", ["doc_id", "lang", "source"]),
    ("lineitem", ["l_orderkey", "l_linenumber", "l_returnflag"]),
    ("orders", ["o_orderkey", "o_custkey", "o_orderstatus"]),
]


def q_table_checksum(sf_dir):
    """Order-independent table digests (stages/integrity.py
    table_checksums): per table, sum(le64(md5(row))) mod 2^61-1 plus the
    row count — the anti-entropy / replica-reconciliation primitive.
    Commutative fold → invariant to block order and parallelism."""
    from osm_export_tool_python_ray.stages.integrity import table_checksums

    return table_checksums(
        [(name, _read(sf_dir, name, cols), cols)
         for name, cols in CHECKSUM_TABLES]
    ).sort("tbl")


def _build_table_checksum_sql():
    parts = []
    for name, cols in CHECKSUM_TABLES:
        rowstr = "concat_ws('|', %s)" % ", ".join(
            "CAST(%s AS VARCHAR)" % c for c in cols
        )
        parts.append(
            "SELECT '%s' AS tbl, count(*) AS n_rows,\n"
            "  CAST(sum(CAST(%s AS HUGEINT)) %%\n"
            "       CAST(2305843009213693951 AS HUGEINT) AS BIGINT) AS checksum\n"
            "FROM (SELECT md5(%s) AS hh FROM %s)"
            % (name, _le64_expr("hh"), rowstr, name)
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY tbl"


SQL_TABLE_CHECKSUM = _build_table_checksum_sql()


def q_asof_join(sf_dir):
    """AS-OF join (stages/temporal.py): every event matched to the most
    recent 'purchase' event of the same user at-or-before its timestamp
    (tie-break: max event_id), null when no purchase precedes. The two
    sides are aligned into one tagged schema and exchanged ONCE on the
    user key; the in-group merge is a lexsort + segmented cummax."""
    from osm_export_tool_python_ray.stages.temporal import asof_match

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    # one pass over the read emits BOTH tagged copies (probe rows + the
    # purchase build rows) — branching the lineage would re-execute the scan
    def tag_both(t: pa.Table) -> pa.Table:
        n = t.num_rows
        left = t.append_column("__side", pa.array(np.ones(n, dtype=np.int8)))
        i = left.schema.get_field_index("value")
        left = left.set_column(i, "value", pa.nulls(n, type=pa.float64()))
        right = t.filter(pc.equal(t.column("event_type"), "purchase"))
        m = right.num_rows
        right = right.append_column("__side", pa.array(np.zeros(m, dtype=np.int8)))
        j = right.schema.get_field_index("event_type")
        right = right.set_column(j, "event_type", pa.nulls(m, type=pa.string()))
        return pa.concat_tables([left, right])

    combined = ds.map_batches(tag_both, batch_format="pyarrow")
    out = asof_match(
        combined,
        key="user_id",
        time_col="ts",
        tie_col="event_id",
        left_cols=["event_id", "user_id", "ts", "event_type"],
        right_cols=["ts", "value", "event_id"],
        out_names=["last_purchase_ts", "last_purchase_value", "last_purchase_event_id"],
    )

    def round_val(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("last_purchase_value")
        return t.set_column(
            i, "last_purchase_value", pc.round(t.column("last_purchase_value"), 4)
        )

    return out.map_batches(round_val, batch_format="pyarrow")


SQL_ASOF_JOIN = """
WITH p AS (
  SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'purchase'
), ranked AS (
  SELECT e.event_id,
         p.ts AS last_purchase_ts,
         round(p.value, 4) AS last_purchase_value,
         p.event_id AS last_purchase_event_id,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY p.ts DESC, p.event_id DESC) AS rn
  FROM events e JOIN p ON e.user_id = p.user_id AND p.ts <= e.ts
)
SELECT e.event_id, e.user_id, e.ts, e.event_type,
       r.last_purchase_ts, r.last_purchase_value, r.last_purchase_event_id
FROM events e LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
  ON e.event_id = r.event_id
"""


def q_range_join(sf_dir):
    """Bounded time-RANGE join (stages/temporal.py): per order, how many
    lineitems (of ANY order) shipped inside [o_orderdate, o_orderdate +
    3 days), plus their total quantity — an unkeyed interval join done as
    epoch-bucketed replication (factor ≤ 2) + per-epoch prefix sums, then
    a tiny keyed fold of the partials."""
    from ray.data.aggregate import Sum

    from osm_export_tool_python_ray.stages.temporal import range_join_time

    day_us = 86_400_000_000
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def add_end(t: pa.Table) -> pa.Table:
        d = (
            t.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        return t.append_column("window_end", pa.array(d + 3 * day_us))

    def quantize_qty(t: pa.Table) -> pa.Table:
        # int 1e-4 sub-units per row before the prefix sums / fold: the
        # summed value is then summation-order independent on both sides
        # (cumsum partials here, DuckDB parallel sum in the oracle), and
        # the final /1e4 is exact-grid — no output round() needed
        q = np.floor(
            t.column("l_quantity").to_numpy(zero_copy_only=False) * 1e4 + 0.5
        ).astype(np.int64)
        return pa.table(
            {"l_shipdate": t.column("l_shipdate"), "l_qty_q4": pa.array(q)}
        )

    partials = range_join_time(
        orders.map_batches(add_end, batch_format="pyarrow"),
        _read(sf_dir, "lineitem", ["l_shipdate", "l_quantity"]).map_batches(
            quantize_qty, batch_format="pyarrow"
        ),
        interval_key="o_orderkey",
        start_col="o_orderdate",
        end_col="window_end",
        point_time="l_shipdate",
        point_values=["l_qty_q4"],
        epoch_us=3 * day_us,
    )
    out = partials.groupby("o_orderkey").aggregate(
        Sum("n", alias_name="n_ship"), Sum("l_qty_q4", alias_name="qty_q4")
    )

    def finish(t: pa.Table) -> pa.Table:
        qty = t.column("qty_q4").to_numpy(zero_copy_only=False) / 1e4
        return t.drop_columns(["qty_q4"]).append_column("sum_qty", pa.array(qty))

    return out.map_batches(finish, batch_format="pyarrow")


SQL_RANGE_JOIN = """
SELECT o.o_orderkey,
       count(l.l_shipdate) AS n_ship,
       CAST(coalesce(
         sum(CAST(floor(l.l_quantity * 1e4 + 0.5) AS BIGINT)), 0
       ) AS DOUBLE) / 1e4 AS sum_qty
FROM orders o LEFT JOIN lineitem l
  ON l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 3 DAY
GROUP BY o.o_orderkey
"""


def _cdc_change_stream(t: pa.Table) -> pa.Table:
    """Deterministic CDC log derived from orders (shared by the engine
    query and, row-for-row, by the oracle's UNION ALL CTE): v1 updates on
    keys %7==3 (v2 override on %21==3), v1 deletes on %7==5 (v2 RESTORE
    on %21==5 — delete-then-upsert, the winner-ordering edge), and
    inserts on %13==0 under fresh keys (+10^9)."""
    k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
    parts = []

    def rows(mask, key_off, version, op, status):
        idx = np.nonzero(mask)[0]
        if not len(idx):
            return
        sub = t.take(pa.array(idx))
        n = len(idx)
        parts.append(
            pa.table(
                {
                    "o_orderkey": pa.array(k[idx] + key_off),
                    "version": pa.array(np.full(n, version, dtype=np.int64)),
                    "op": pa.array(np.full(n, op), type=pa.string()),
                    "o_custkey": (
                        sub.column("o_custkey")
                        if status is not None
                        else pa.nulls(n, type=pa.int64())
                    ),
                    "o_orderstatus": (
                        pa.array(np.full(n, status), type=pa.string())
                        if status is not None
                        else pa.nulls(n, type=pa.string())
                    ),
                    "o_totalprice": (
                        sub.column("o_totalprice")
                        if status is not None
                        else pa.nulls(n, type=pa.float64())
                    ),
                }
            )
        )

    rows(k % 7 == 3, 0, 1, "U", "U1")
    rows(k % 21 == 3, 0, 2, "U", "U2")
    rows(k % 7 == 5, 0, 1, "D", None)
    rows(k % 21 == 5, 0, 2, "U", "RESTORED")
    rows(k % 13 == 0, 1_000_000_000, 1, "U", "NEW")
    if not parts:
        return pa.table(
            {
                "o_orderkey": pa.array([], type=pa.int64()),
                "version": pa.array([], type=pa.int64()),
                "op": pa.array([], type=pa.string()),
                "o_custkey": pa.array([], type=pa.int64()),
                "o_orderstatus": pa.array([], type=pa.string()),
                "o_totalprice": pa.array([], type=pa.float64()),
            }
        )
    return pa.concat_tables(parts)


def q_cdc_merge(sf_dir):
    """CDC MERGE / upsert (stages/merge.py): apply a derived change
    stream (updates, version overrides, deletes, delete-then-restore,
    inserts) to the orders snapshot; highest version per key wins. The
    float o_totalprice is a pass-through of the SAME parquet bytes on
    both sides — no arithmetic, no rounding surface."""
    from osm_export_tool_python_ray.stages.merge import cdc_merge

    base = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    )
    changes = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    ).map_batches(_cdc_change_stream, batch_format="pyarrow")
    return cdc_merge(base, changes, "o_orderkey").sort("o_orderkey")


SQL_CDC_MERGE = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
),
changes AS (
  SELECT o_orderkey AS k, 1 AS version, 'U' AS op,
         o_custkey, 'U1' AS o_orderstatus, o_totalprice
  FROM base WHERE o_orderkey % 7 = 3
  UNION ALL
  SELECT o_orderkey, 2, 'U', o_custkey, 'U2', o_totalprice
  FROM base WHERE o_orderkey % 21 = 3
  UNION ALL
  SELECT o_orderkey, 1, 'D', NULL, NULL, NULL
  FROM base WHERE o_orderkey % 7 = 5
  UNION ALL
  SELECT o_orderkey, 2, 'U', o_custkey, 'RESTORED', o_totalprice
  FROM base WHERE o_orderkey % 21 = 5
  UNION ALL
  SELECT o_orderkey + 1000000000, 1, 'U', o_custkey, 'NEW', o_totalprice
  FROM base WHERE o_orderkey % 13 = 0
),
w AS (
  SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
  FROM changes
),
win AS (SELECT * FROM w WHERE rn = 1)
SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus, b.o_totalprice
FROM base b LEFT JOIN win ON win.k = b.o_orderkey
WHERE win.k IS NULL
UNION ALL
SELECT k AS o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM win WHERE op = 'U'
ORDER BY o_orderkey
"""


def q_rect_union(sf_dir):
    """Measure-of-union (Klee's problem) over axis-aligned integer
    rectangles derived from event ids (stages/intervals.py
    rect_union_area): exact union area per 100-column x-band via
    rasterize-to-columns + the endpoint-cumsum interval sweep. All-int64
    compare surface."""
    from osm_export_tool_python_ray.stages.intervals import rect_union_area

    ds = _read(sf_dir, "events", ["event_id"])

    def rects(t: pa.Table) -> pa.Table:
        e = t.column("event_id").to_numpy(zero_copy_only=False)
        x0 = (e * 13) % 1000
        y0 = (e * 31) % 1000
        return pa.table(
            {
                "x0": pa.array(x0),
                "x1": pa.array(x0 + 1 + (e * 7) % 50),
                "y0": pa.array(y0),
                "y1": pa.array(y0 + 1 + (e * 11) % 40),
            }
        )

    return rect_union_area(
        ds.map_batches(rects, batch_format="pyarrow"), band=100
    ).sort("band")


SQL_RECT_UNION = """
WITH rects AS (
  SELECT (event_id * 13) % 1000 AS x0,
         1 + (event_id * 7) % 50 AS w,
         (event_id * 31) % 1000 AS y0,
         1 + (event_id * 11) % 40 AS h
  FROM events
),
cols AS (
  -- DISTINCT: union is idempotent, and deduping removes (y0, y1) ties
  -- inside each x partition — with ties, DuckDB's parallel window sort
  -- is nondeterministic and the gaps-and-islands running max can split
  -- islands differently run to run (observed at sf0.01).
  SELECT DISTINCT x0 + i AS x, y0, y0 + h AS y1
  FROM rects, UNNEST(range(0, w)) t(i)
),
marked AS (
  SELECT x, y0, y1,
         CASE WHEN y0 > coalesce(max(y1) OVER (
                PARTITION BY x ORDER BY y0, y1
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS flag
  FROM cols
),
islands AS (
  SELECT x, y0, y1,
         sum(flag) OVER (PARTITION BY x ORDER BY y0, y1
                         ROWS UNBOUNDED PRECEDING) AS g
  FROM marked
),
lens AS (
  SELECT x, g, max(y1) - min(y0) AS len FROM islands GROUP BY x, g
)
SELECT x // 100 AS band, CAST(sum(len) AS BIGINT) AS union_area
FROM lens GROUP BY 1 ORDER BY band
"""


# ----------------------------------------------------------------- spatial

def _customer_points(t: pa.Table) -> pa.Table:
    """Deterministic synthetic lon/lat from c_custkey (shared with the SQL
    oracle formula verbatim)."""
    k = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.float64)
    lon = np.mod(k, 100.0) * 0.01
    lat = np.mod(np.floor(k / 7.0), 100.0) * 0.01
    return pa.table(
        {
            "c_custkey": t.column("c_custkey"),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
        }
    )


def q_cell_counts(sf_dir):
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        _customer_points, batch_format="pyarrow"
    )

    def partial(t: pa.Table) -> pa.Table:
        cells = cell_of(
            t.column("lon").to_numpy(zero_copy_only=False),
            t.column("lat").to_numpy(zero_copy_only=False),
            res=8,
        ).astype(np.int64)
        u, c = np.unique(cells, return_counts=True)
        return pa.table({"cell": pa.array(u), "n_partial": pa.array(c.astype(np.int64))})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_partial", alias_name="n"))
    )


# scale at res 8: 2^(8+7)/360 cells per degree; id = 8·2^58 + ix·2^29 + iy
SQL_CELL_COUNTS = """
WITH pts AS (
  SELECT (c_custkey % 100) * 0.01 AS lon,
         (CAST(floor(c_custkey / 7.0) AS BIGINT) % 100) * 0.01 AS lat
  FROM customer
), cells AS (
  SELECT CAST(8 AS BIGINT) * 288230376151711744
       + CAST(floor((lon + 180.0) * 32768.0 / 360.0) AS BIGINT) * 536870912
       + CAST(floor((lat + 90.0) * 32768.0 / 360.0) AS BIGINT) AS cell
  FROM pts
)
SELECT cell, count(*) AS n FROM cells GROUP BY cell
"""


def q_cell_pyramid(sf_dir):
    """Hierarchical multi-resolution cell rollup (the H3-pyramid
    pattern): per-cell counts at res 8, then res 6 and res 4 REAGGREGATED
    FROM THE CHILD AGGREGATES by parent bit-shift — the base table is
    scanned exactly once, and each coarser level is a groupby over
    |cells(finer)| rows, not over the data. The oracle re-derives the
    same pyramid with the identical shift arithmetic (i8 // 4 // 16), so
    a parent/child bit-math inconsistency in cells.py would surface as a
    hash mismatch."""
    from ray.data.aggregate import Sum

    mask = (1 << 29) - 1

    def decode(res):
        def fn(t: pa.Table) -> pa.Table:
            cell = t.column("cell").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "res": pa.array(np.full(len(cell), res, dtype=np.int64)),
                    "ix": pa.array((cell >> 29) & mask),
                    "iy": pa.array(cell & mask),
                    "n": t.column("n"),
                }
            )

        return fn

    def to_parent(delta, new_res):
        def fn(t: pa.Table) -> pa.Table:
            cell = t.column("cell").to_numpy(zero_copy_only=False)
            n = t.column("n").to_numpy(zero_copy_only=False)
            ix = (cell >> 29) & mask
            iy = cell & mask
            p = (np.int64(new_res) << 58) | ((ix >> delta) << 29) | (iy >> delta)
            u, inv = np.unique(p, return_inverse=True)
            sums = np.zeros(len(u), dtype=np.int64)
            np.add.at(sums, inv, n)
            return pa.table({"cell": pa.array(u), "n_partial": pa.array(sums)})

        return fn

    # aggregate-sized intermediates: materialize so the union + next
    # rollup don't re-execute the base scan per consumer
    l8 = q_cell_counts(sf_dir).materialize()
    l6 = (
        l8.map_batches(to_parent(2, 6), batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_partial", alias_name="n"))
        .materialize()
    )
    l4 = (
        l6.map_batches(to_parent(2, 4), batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_partial", alias_name="n"))
    )
    out = (
        l8.map_batches(decode(8), batch_format="pyarrow")
        .union(l6.map_batches(decode(6), batch_format="pyarrow"))
        .union(l4.map_batches(decode(4), batch_format="pyarrow"))
    )
    return out.sort(["res", "ix", "iy"])


SQL_CELL_PYRAMID = """
WITH pts AS (
  SELECT (c_custkey % 100) * 0.01 AS lon,
         (CAST(floor(c_custkey / 7.0) AS BIGINT) % 100) * 0.01 AS lat
  FROM customer
), i8 AS (
  SELECT CAST(floor((lon + 180.0) * 32768.0 / 360.0) AS BIGINT) AS ix,
         CAST(floor((lat + 90.0) * 32768.0 / 360.0) AS BIGINT) AS iy
  FROM pts
), l8 AS (
  SELECT CAST(8 AS BIGINT) AS res, ix, iy, count(*) AS n FROM i8 GROUP BY ix, iy
), l6 AS (
  SELECT CAST(6 AS BIGINT) AS res, ix // 4 AS ix, iy // 4 AS iy,
         CAST(sum(n) AS BIGINT) AS n
  FROM l8 GROUP BY ix // 4, iy // 4
), l4 AS (
  SELECT CAST(4 AS BIGINT) AS res, ix // 4 AS ix, iy // 4 AS iy,
         CAST(sum(n) AS BIGINT) AS n
  FROM l6 GROUP BY ix // 4, iy // 4
)
SELECT * FROM l8 UNION ALL SELECT * FROM l6 UNION ALL SELECT * FROM l4
"""


def q_cell_density(sf_dir):
    """3x3 box-kernel density smoothing (stages/hotspots.py): per
    occupied res-8 cell, its own point count and the summed 3x3
    neighborhood count. Batch combiner first (the exchange moves cell
    aggregates, never points), then the x9 neighbor replication of the
    PARTIALS and one groupby fold that carries the occupancy filter
    in-band — no join-back."""
    from osm_export_tool_python_ray.stages.hotspots import cell_density_smooth

    return cell_density_smooth(
        _read(sf_dir, "customer", ["c_custkey"]).map_batches(
            _customer_points, batch_format="pyarrow"
        ),
        res=8,
    )


SQL_CELL_DENSITY = """
WITH pts AS (
  SELECT (c_custkey % 100) * 0.01 AS lon,
         (CAST(floor(c_custkey / 7.0) AS BIGINT) % 100) * 0.01 AS lat
  FROM customer
), i8 AS (
  SELECT CAST(floor((lon + 180.0) * 32768.0 / 360.0) AS BIGINT) AS ix,
         CAST(floor((lat + 90.0) * 32768.0 / 360.0) AS BIGINT) AS iy
  FROM pts
), cellagg AS (
  SELECT ix, iy, count(*) AS n FROM i8 GROUP BY ix, iy
)
SELECT CAST(8 AS BIGINT) * 288230376151711744 + a.ix * 536870912 + a.iy AS cell,
       CAST(any_value(a.n) AS BIGINT) AS n,
       CAST(sum(b.n) AS BIGINT) AS smooth_n
FROM cellagg a JOIN cellagg b
  ON abs(a.ix - b.ix) <= 1 AND abs(a.iy - b.iy) <= 1
GROUP BY a.ix, a.iy
"""


GRID_CLUSTER_MIN_PTS = 2


def q_grid_clusters(sf_dir):
    """DBSCAN-lite hotspot clustering (stages/hotspots.py): res-8 cells
    with >= min_pts points are core, 4-connected core cells form a
    cluster, label = MIN packed cell id (the ngram_clusters min-label
    rule). Points collapse to cell aggregates before any exchange; the
    union-find runs on the reduced core-cell table; stats fold
    distributively under a broadcast label map."""
    from osm_export_tool_python_ray.stages.hotspots import grid_clusters

    return grid_clusters(
        _read(sf_dir, "customer", ["c_custkey"]).map_batches(
            _customer_points, batch_format="pyarrow"
        ),
        res=8,
        min_pts=GRID_CLUSTER_MIN_PTS,
    )


# recursive min-label walk = connected components (the ngram_clusters
# oracle pattern); 4-adjacency in packed space is +1 (iy) / +2^29 (ix),
# overflow-free at res 8 (iy < 2^16)
SQL_GRID_CLUSTERS = ("""
WITH pts AS (
  SELECT (c_custkey % 100) * 0.01 AS lon,
         (CAST(floor(c_custkey / 7.0) AS BIGINT) % 100) * 0.01 AS lat
  FROM customer
), i8 AS (
  SELECT CAST(floor((lon + 180.0) * 32768.0 / 360.0) AS BIGINT) AS ix,
         CAST(floor((lat + 90.0) * 32768.0 / 360.0) AS BIGINT) AS iy
  FROM pts
), cellagg AS (
  SELECT ix, iy, count(*) AS n FROM i8 GROUP BY ix, iy
), core AS (
  SELECT CAST(8 AS BIGINT) * 288230376151711744 + ix * 536870912 + iy AS cell, n
  FROM cellagg WHERE n >= {min_pts}
), edges AS (
  SELECT a.cell AS a, b.cell AS b FROM core a JOIN core b
    ON b.cell = a.cell + 1 OR b.cell = a.cell + 536870912
  UNION ALL
  SELECT b.cell, a.cell FROM core a JOIN core b
    ON b.cell = a.cell + 1 OR b.cell = a.cell + 536870912
), """ + _CC_CHAIN_CORE + """, lab AS (
  SELECT node, label AS cluster_id FROM """ + _CC_FINAL_CORE + """
)
SELECT lab.cluster_id, count(*) AS n_cells, CAST(sum(core.n) AS BIGINT) AS n_points
FROM core JOIN lab ON lab.node = core.cell
GROUP BY lab.cluster_id
""").format(min_pts=GRID_CLUSTER_MIN_PTS)


def q_user_hulls(sf_dir):
    """Per-user STRICT convex hull of trajectory points (stages/journey.py
    user_hulls / hull_vertices): Andrew monotone chain over the deduped
    integer grid points, collinear boundary points excluded — exact int64
    cross products only, so the oracle's independent edge
    characterization (a directed pair is a hull edge iff every other
    point is strictly left OR collinear strictly between) selects the
    identical vertex set with zero tolerance."""
    from osm_export_tool_python_ray.stages.journey import user_hulls

    return user_hulls(_read(sf_dir, "events", ["event_id", "user_id"]))


# Independent re-derivation (NOT a chain replay): hull edges by the
# all-points-strictly-left-or-between test, vertices = edge endpoints,
# plus single-distinct-point users. Exact integers; cost sum(n^3) over
# per-user deduped point counts (n <= 100 on the synthetic grid).
SQL_USER_HULLS = """
WITH pts AS (
  SELECT DISTINCT user_id,
         CAST(event_id % 100 AS BIGINT) AS x,
         CAST(floor(event_id / 7.0) AS BIGINT) % 100 AS y
  FROM events
), ncnt AS (
  SELECT user_id, count(*) AS n FROM pts GROUP BY user_id
), edges AS (
  SELECT a.user_id, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by2
  FROM pts a JOIN pts b
    ON b.user_id = a.user_id AND (a.x <> b.x OR a.y <> b.y)
  WHERE NOT EXISTS (
    SELECT 1 FROM pts c
    WHERE c.user_id = a.user_id
      AND (c.x <> a.x OR c.y <> a.y) AND (c.x <> b.x OR c.y <> b.y)
      AND NOT (
        (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) > 0
        OR (
          (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) = 0
          AND (c.x - a.x) * (b.x - a.x) + (c.y - a.y) * (b.y - a.y) > 0
          AND (c.x - a.x) * (b.x - a.x) + (c.y - a.y) * (b.y - a.y)
            < (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y)
        )
      )
  )
)
SELECT user_id, x, y FROM (
  SELECT user_id, ax AS x, ay AS y FROM edges
  UNION
  SELECT user_id, bx, by2 FROM edges
  UNION
  SELECT p.user_id, p.x, p.y FROM pts p JOIN ncnt USING (user_id)
  WHERE ncnt.n = 1
)
"""


def q_od_matrix(sf_dir):
    """Origin-destination matrix (stages/journey.py od_matrix): per
    user, first-event -> last-event grid points in (ts, event_id) order,
    folded to distinct-OD-pair user counts. One user-keyed exchange with
    per-partition OD partials (packed-key unique) before the 4-key
    groupby — pure int64."""
    from osm_export_tool_python_ray.stages.journey import od_matrix

    return od_matrix(_read(sf_dir, "events", ["event_id", "user_id", "ts"]))


SQL_OD_MATRIX = """
WITH pts AS (
  SELECT user_id,
         CAST(event_id % 100 AS BIGINT) AS x,
         CAST(floor(event_id / 7.0) AS BIGINT) % 100 AS y,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS cnt
  FROM events
), o AS (SELECT user_id, x AS ox, y AS oy FROM pts WHERE rn = 1),
d AS (SELECT user_id, x AS dx, y AS dy FROM pts WHERE rn = cnt)
SELECT ox, oy, dx, dy, count(*) AS n_users
FROM o JOIN d USING (user_id)
GROUP BY ox, oy, dx, dy
"""


def q_trajectory_geometry(sf_dir):
    """Per-user exact-integer geometry (stages/journey.py
    trajectory_geometry): properly-crossing segment pairs of the
    trajectory polyline (strict straddle products — touches, shared
    endpoints and collinear overlaps excluded by the predicate itself)
    and twice the strict-convex-hull area (CCW shoelace over the
    monotone-chain cycle). The oracle re-derives the crossing count from
    the identical orientation products and the area from the hull-edge
    characterization's CCW boundary edges — all int64, zero
    tolerance."""
    from osm_export_tool_python_ray.stages.journey import trajectory_geometry

    return trajectory_geometry(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    )


# area2 via the user_hulls edge characterization: the qualifying
# DIRECTED edges are exactly the CCW boundary edges (the CW reverse
# fails the strictly-left test), so the shoelace sum over them is the
# hull area; degenerate hulls contribute both directions -> sum 0.
SQL_TRAJECTORY_GEOMETRY = """
WITH pts AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS idx,
         CAST(event_id % 100 AS BIGINT) AS x,
         CAST(floor(event_id / 7.0) AS BIGINT) % 100 AS y
  FROM events
), seg AS (
  SELECT user_id, idx, x AS ax, y AS ay,
         lead(x) OVER w AS bx, lead(y) OVER w AS by2
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY idx)
), segs AS (
  SELECT * FROM seg WHERE bx IS NOT NULL
), ncross AS (
  SELECT s.user_id, count(*) AS n_cross
  FROM segs s JOIN segs t ON t.user_id = s.user_id AND t.idx > s.idx
  WHERE ((s.bx - s.ax) * (t.ay - s.ay) - (s.by2 - s.ay) * (t.ax - s.ax))
      * ((s.bx - s.ax) * (t.by2 - s.ay) - (s.by2 - s.ay) * (t.bx - s.ax)) < 0
    AND ((t.bx - t.ax) * (s.ay - t.ay) - (t.by2 - t.ay) * (s.ax - t.ax))
      * ((t.bx - t.ax) * (s.by2 - t.ay) - (t.by2 - t.ay) * (s.bx - t.ax)) < 0
  GROUP BY s.user_id
), dpts AS (
  SELECT DISTINCT user_id, x, y FROM pts
), hedges AS (
  SELECT a.user_id, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by2
  FROM dpts a JOIN dpts b
    ON b.user_id = a.user_id AND (a.x <> b.x OR a.y <> b.y)
  WHERE NOT EXISTS (
    SELECT 1 FROM dpts c
    WHERE c.user_id = a.user_id
      AND (c.x <> a.x OR c.y <> a.y) AND (c.x <> b.x OR c.y <> b.y)
      AND NOT (
        (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) > 0
        OR (
          (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) = 0
          AND (c.x - a.x) * (b.x - a.x) + (c.y - a.y) * (b.y - a.y) > 0
          AND (c.x - a.x) * (b.x - a.x) + (c.y - a.y) * (b.y - a.y)
            < (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y)
        )
      )
  )
), harea AS (
  SELECT user_id, CAST(sum(ax * by2 - bx * ay) AS BIGINT) AS hull_area2
  FROM hedges GROUP BY user_id
)
SELECT u.user_id,
       coalesce(nc.n_cross, 0) AS n_cross,
       coalesce(ha.hull_area2, 0) AS hull_area2
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN ncross nc USING (user_id)
LEFT JOIN harea ha USING (user_id)
"""


BFS_MAX_HOPS = 6


def q_grid_distance(sf_dir):
    """Isochrone-style multi-source BFS (stages/hotspots.py
    grid_bfs_distance): hop distance over customer-occupied res-8 cells
    (4-adjacency, walkable = occupied) from the nearest supplier-seeded
    cell, capped at {h} hops. Reduced-graph shape: both point layers
    collapse to cell aggregates before anything global; the BFS runs on
    the collected cell table and the distance map broadcasts back into a
    distributed attach.""".format(h=BFS_MAX_HOPS)
    from osm_export_tool_python_ray.stages.hotspots import grid_bfs_distance

    def supplier_points(t: pa.Table) -> pa.Table:
        k = t.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "lon": pa.array(np.mod(k, 100.0) * 0.01 + 0.003),
                "lat": pa.array(np.mod(np.floor(k / 3.0), 100.0) * 0.01 + 0.004),
            }
        )

    return grid_bfs_distance(
        _read(sf_dir, "customer", ["c_custkey"]).map_batches(
            _customer_points, batch_format="pyarrow"
        ),
        _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
            supplier_points, batch_format="pyarrow"
        ),
        res=8,
        max_hops=BFS_MAX_HOPS,
    )


# recursive BFS min-distance walk; UNION dedups (cell, d) pairs and the
# d < max_hops guard terminates the recursion
SQL_GRID_DISTANCE = """
WITH RECURSIVE occ AS (
  SELECT DISTINCT CAST(8 AS BIGINT) * 288230376151711744
       + CAST(floor(((c_custkey % 100) * 0.01 + 180.0) * 32768.0 / 360.0) AS BIGINT) * 536870912
       + CAST(floor(((CAST(floor(c_custkey / 7.0) AS BIGINT) % 100) * 0.01 + 90.0) * 32768.0 / 360.0) AS BIGINT) AS cell
  FROM customer
), seedc AS (
  SELECT DISTINCT CAST(8 AS BIGINT) * 288230376151711744
       + CAST(floor(((s_suppkey % 100) * 0.01 + 0.003 + 180.0) * 32768.0 / 360.0) AS BIGINT) * 536870912
       + CAST(floor(((CAST(floor(s_suppkey / 3.0) AS BIGINT) % 100) * 0.01 + 0.004 + 90.0) * 32768.0 / 360.0) AS BIGINT) AS cell
  FROM supplier
), seeds AS (
  -- INTERSECT is rejected inside a WITH RECURSIVE chain; join instead
  SELECT o.cell FROM occ o JOIN seedc s ON s.cell = o.cell
), walk(cell, d) AS (
  SELECT cell, CAST(0 AS BIGINT) FROM seeds
  UNION
  SELECT o.cell, w.d + 1
  FROM walk w JOIN occ o
    ON o.cell IN (w.cell + 1, w.cell - 1, w.cell + 536870912, w.cell - 536870912)
  WHERE w.d < {h}
)
SELECT cell, min(d) AS dist FROM walk GROUP BY cell
""".format(h=BFS_MAX_HOPS)


STAY_MIN_DWELL_US = 3_600_000_000  # 1 hour


def q_stay_points(sf_dir):
    """Stay-point detection (stages/journey.py stay_points): per user,
    maximal runs of consecutive events (journey (ts, event_id) order)
    inside one coarse 10x10 grid cell, kept when the run has >= 2 events
    and >= 1 hour of dwell; rolled up to (user_id, n_stays,
    total_dwell_us, max_dwell_us). One user-keyed exchange, one
    vectorized pass, rows emit per-user with no further groupby — pure
    int64 microsecond arithmetic on both sides."""
    from osm_export_tool_python_ray.stages.journey import stay_points

    return stay_points(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        cell_div=10,
        min_events=2,
        min_dwell_us=STAY_MIN_DWELL_US,
    )


# gaps-and-islands: within (user, cell) the global row_number minus the
# per-(user, cell) row_number is constant exactly on maximal consecutive
# runs (a revisit strictly increases the difference) — same (ts,
# event_id) tie-break as the engine's lexsort
SQL_STAY_POINTS = """
WITH pts0 AS (
  SELECT user_id, ts, event_id,
         (event_id % 100) // 10 AS cx,
         (CAST(floor(event_id / 7.0) AS BIGINT) % 100) // 10 AS cy
  FROM events
), pts AS (
  SELECT user_id, ts, cx, cy,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - row_number() OVER (PARTITION BY user_id, cx, cy
                                ORDER BY ts, event_id) AS grp
  FROM pts0
), runs AS (
  SELECT user_id,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS dwell
  FROM pts GROUP BY user_id, cx, cy, grp
  HAVING count(*) >= 2
     AND epoch_us(max(ts)) - epoch_us(min(ts)) >= {d}
)
SELECT user_id, count(*) AS n_stays,
       CAST(sum(dwell) AS BIGINT) AS total_dwell_us,
       max(dwell) AS max_dwell_us
FROM runs GROUP BY user_id
""".format(d=STAY_MIN_DWELL_US)


def q_encounters(sf_dir):
    """Co-location detection (stages/journey.py encounters): distinct
    user pairs sharing a coarse grid cell within the same hour bucket,
    with n_shared = number of distinct shared (cell, hour) groups. The
    exchange moves distinct presence rows (batch combiner), the pair
    expansion is vectorized repeat/cumsum arithmetic, and oversized
    groups truncate under a counted cap (never hit at oracle scales —
    asserted in tests)."""
    from osm_export_tool_python_ray.stages.journey import encounters

    return encounters(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        cell_div=10,
        bucket_us=3_600_000_000,
    )


SQL_ENCOUNTERS = """
WITH p AS (
  SELECT DISTINCT user_id,
         (event_id % 100) // 10 AS cx,
         (CAST(floor(event_id / 7.0) AS BIGINT) % 100) // 10 AS cy,
         epoch_us(ts) // 3600000000 AS hr
  FROM events
)
SELECT a.user_id AS user_a, b.user_id AS user_b, count(*) AS n_shared
FROM p a JOIN p b
  ON a.cx = b.cx AND a.cy = b.cy AND a.hr = b.hr AND a.user_id < b.user_id
GROUP BY a.user_id, b.user_id
"""


def q_butterflies(sf_dir):
    """Bipartite butterfly (4-cycle) counts per user (stages/graph.py
    butterfly_counts) over the user × (cell, hour) presence graph: each
    encounter pair with c shared groups contributes C(c, 2) butterflies
    to both endpoints. Motif family: the bipartite counterpart of
    q_triangles."""
    from osm_export_tool_python_ray.stages.graph import butterfly_counts
    from osm_export_tool_python_ray.stages.journey import encounters

    pairs = encounters(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        cell_div=10,
    )
    return butterfly_counts(pairs).sort("user_id")


SQL_BUTTERFLIES = """
WITH p AS (
  SELECT DISTINCT user_id,
         (event_id % 100) // 10 AS cx,
         (CAST(floor(event_id / 7.0) AS BIGINT) % 100) // 10 AS cy,
         epoch_us(ts) // 3600000000 AS hr
  FROM events
),
pairs AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b, count(*) AS c
  FROM p a JOIN p b
    ON a.cx = b.cx AND a.cy = b.cy AND a.hr = b.hr AND a.user_id < b.user_id
  GROUP BY a.user_id, b.user_id
),
contrib AS (
  SELECT user_a AS user_id, c * (c - 1) // 2 AS bf FROM pairs
  UNION ALL
  SELECT user_b, c * (c - 1) // 2 FROM pairs
)
SELECT user_id, sum(bf) AS butterflies
FROM contrib WHERE bf > 0
GROUP BY user_id ORDER BY user_id
"""


def q_user_pagerank(sf_dir):
    """Weighted PageRank on the co-location graph (stages/graph.py
    pagerank_scores): the q_encounters pair table as an undirected
    weighted graph, three integer-exact power iterations (micro-unit
    int64, floor division — summation-order independent), node state
    held ONLY in datasets. The generic-graph sibling of
    q_textrank_keywords: same per-iteration shape (one keyed join +
    one groupby-sum over the materialized edge aggregate), arbitrary
    node ids instead of a driver vocabulary."""
    from osm_export_tool_python_ray.stages.graph import pagerank_scores
    from osm_export_tool_python_ray.stages.journey import encounters

    pairs = encounters(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        cell_div=10,
    )
    return pagerank_scores(pairs, iters=3).sort("node")


def _build_user_pagerank_sql(iters=3):
    it_tpl = """
s{n} AS (
  SELECT nd.node,
         CAST(150000 + coalesce(sum((85 * s.s * d.w) // (100 * wdeg.wd)), 0)
              AS BIGINT) AS s
  FROM nodes nd
  LEFT JOIN dir d ON d.dst = nd.node
  LEFT JOIN s{p} s ON s.node = d.src
  LEFT JOIN wdeg ON wdeg.src = d.src
  GROUP BY nd.node
)"""
    its = ",".join(it_tpl.format(n=i + 1, p=i) for i in range(iters))
    return """
WITH p AS (
  SELECT DISTINCT user_id,
         (event_id %% 100) // 10 AS cx,
         (CAST(floor(event_id / 7.0) AS BIGINT) %% 100) // 10 AS cy,
         epoch_us(ts) // 3600000000 AS hr
  FROM events
),
pairs AS (
  SELECT a.user_id AS ua, b.user_id AS ub, count(*) AS w
  FROM p a JOIN p b
    ON a.cx = b.cx AND a.cy = b.cy AND a.hr = b.hr AND a.user_id < b.user_id
  GROUP BY a.user_id, b.user_id
),
dir AS (SELECT ua AS src, ub AS dst, w FROM pairs
        UNION ALL SELECT ub, ua, w FROM pairs),
wdeg AS (SELECT src, sum(w) AS wd FROM dir GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM dir),
s0 AS (SELECT node, CAST(1000000 AS BIGINT) AS s FROM nodes),
%s
SELECT node, s AS score FROM s%d ORDER BY node
""" % (its, iters)


SQL_USER_PAGERANK = _build_user_pagerank_sql()


def q_group_mode(sf_dir):
    """Per-group mode — each user's most frequent event_type with a
    deterministic tie-break (higher count wins, then lexicographically
    smaller type). The holistic aggregate the existing quantile/top-k
    family lacks. Shape: per-batch (user, type) count combiner, ONE
    composite-key groupby-sum, then a user-keyed argmax fold that is a
    vectorized lexsort + segment-boundary pick (no Python per group)."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "event_type": g.column("event_type"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    counted = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .sum(["n"])
    )

    def argmax_fold(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "mode_type": pa.array([], type=pa.string()),
                    "mode_n": pa.array([], type=pa.int64()),
                }
            )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        n = t.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64)
        # winner first within each user: (user asc, n desc, type asc)
        order = np.lexsort((et, -n, u))
        u, et, n = u[order], et[order], n[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        return pa.table(
            {
                "user_id": pa.array(u[first]),
                "mode_type": pa.array(list(et[first]), type=pa.string()),
                "mode_n": pa.array(n[first]),
            }
        )

    def bucketed(t: pa.Table) -> pa.Table:
        b = (
            t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64) % 16
        ).astype(np.int32)
        return t.append_column("b", pa.array(b))

    return grouped_map(
        counted.map_batches(bucketed, batch_format="pyarrow"),
        key="b",
        fn=lambda t: argmax_fold(t.drop_columns(["b"])),
        num_partitions=8,
        payload_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("sum(n)", pa.int64()),
                ("b", pa.int32()),
            ]
        ),
    )


SQL_GROUP_MODE = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       event_type AS mode_type,
       n AS mode_n
FROM c
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY n DESC, event_type ASC
) = 1
"""


def q_type_entropy(sf_dir):
    """Per-user Shannon entropy of the event-type distribution in
    integer micro-nats — the diversity/anomaly score a behavioural
    audit computes next to q_activity_histogram's volume profile.

    Closed form avoiding any float accumulation:

        H = ln N − (Σ_types c·ln c) / N

    Quantize ln BEFORE every sum (the unigram_logprob discipline):
    S = Σ c·round(ln(c)·10⁶) is then int64-exact and summation-order
    independent, and h_micro = round(ln(N)·10⁶) − S // N (all terms
    ≥ 0, so DuckDB's truncating // equals numpy's floor //). Shape:
    per-batch (user, type) count combiner, one composite groupby, one
    user groupby — no driver state."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "event_type": g.column("event_type"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    counted = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .sum(["n"])
    )

    def terms(t: pa.Table) -> pa.Table:
        c = t.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64)
        q = qround(np.log(c.astype(np.float64)) * 1e6, "entropy_lnc")
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "s": pa.array(c * q),
                "n": pa.array(c),
            }
        )

    per_user = (
        counted.map_batches(terms, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        h = qround(np.log(n.astype(np.float64)) * 1e6, "entropy_lnn") - s // n
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "h_micro": pa.array(h),
                "n_events": pa.array(n),
            }
        )

    return per_user.map_batches(finish, batch_format="pyarrow")


SQL_TYPE_ENTROPY = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type
),
s AS (
  SELECT user_id,
         CAST(sum(n * {QR_LN}) AS BIGINT) AS s,
         CAST(sum(n) AS BIGINT) AS n
  FROM c GROUP BY user_id
)
SELECT user_id,
       {QR_LN} - s // n AS h_micro,
       n AS n_events
FROM s
""".format(QR_LN=sql_qround("ln(CAST(n AS DOUBLE)) * 1e6"))


def q_user_paths(sf_dir):
    """Ordered group-concat (sequence assembly): per user, the FIRST 20
    event types in (ts, event_id) order joined with ',' plus the user's
    total event count — the session-path string a Markov/behavior model
    trains on. The collect_list/string_agg holistic aggregate the
    engine's sum/count/quantile/mode family lacked. ONE user-keyed
    exchange; the fold is a vectorized lexsort + segment-boundary scan
    with only a per-GROUP (never per-row) join loop, capped at 20
    elements per group."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def keyed(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "user_id": pa.array(u),
                "ts": pa.array(ts),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "bucket": pa.array((u % 32).astype(np.int32)),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        OUT = pa.schema(
            [("user_id", pa.int64()), ("path", pa.string()), ("n_events", pa.int64())]
        )
        if g.num_rows == 0:
            return OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u, et = u[order], et[order]
        starts = np.nonzero(np.concatenate([[True], u[1:] != u[:-1]]))[0]
        ends = np.append(starts[1:], len(u))
        paths = [
            ",".join(et[s : min(s + 20, e)]) for s, e in zip(starts, ends)
        ]
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "path": pa.array(paths, type=pa.string()),
                "n_events": pa.array((ends - starts).astype(np.int64)),
            }
        )

    return grouped_map(
        ds.map_batches(keyed, batch_format="pyarrow"),
        "bucket",
        lambda g: fold(g.drop_columns(["bucket"])),
        num_partitions=8,
        payload_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("ts", pa.int64()),
                ("event_id", pa.int64()),
                ("event_type", pa.string()),
            ]
        ),
    )


SQL_USER_PATHS = """
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT o.user_id,
       string_agg(o.event_type, ',' ORDER BY o.rn) AS path,
       c.n_events
FROM o JOIN c USING (user_id)
WHERE o.rn <= 20
GROUP BY o.user_id, c.n_events
"""


def q_hour_pivot(sf_dir):
    """Crosstab / PIVOT: event_type × hour-of-day counts as a WIDE
    24-column table (h0..h23, total) — the report-shaped output BI
    tools expect, as opposed to cube_rollup's long-form grouping sets.
    Per-batch (type, hour) combiner collapses events to ≤ |types|·24
    rows before ONE type-keyed exchange; the pivot fold is a vectorized
    scatter into a (groups × 24) matrix."""
    return hour_pivot_over(_read(sf_dir, "events", ["ts", "event_type"]))


def hour_pivot_over(ds):
    """The hour_pivot stage over ANY events dataset with (ts,
    event_type) — composable form (see examples/events_analytics.py)."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map

    def partial(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        hr = (ts // np.int64(3_600_000_000)) % 24
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        types, inv = np.unique(et, return_inverse=True)
        pk = inv.astype(np.int64) * 24 + hr
        upk, cnt = np.unique(pk, return_counts=True)
        ti = (upk // 24).astype(np.int64)
        # deterministic cross-process hash (builtin hash() is seeded
        # per process — same type would land in different buckets)
        import hashlib as _hl

        th = np.asarray(
            [
                int.from_bytes(
                    _hl.md5(s.encode()).digest()[:8], "little", signed=False
                )
                % (1 << 62)
                for s in types[ti]
            ],
            dtype=np.int64,
        )
        return pa.table(
            {
                "event_type": pa.array(list(types[ti]), type=pa.string()),
                "hr": pa.array(upk % 24),
                "n": pa.array(cnt.astype(np.int64)),
                "bucket": pa.array((th % 16).astype(np.int32)),
            }
        )

    def pivot(g: pa.Table) -> pa.Table:
        fields = [("event_type", pa.string())] + [
            ("h%d" % h, pa.int64()) for h in range(24)
        ] + [("total", pa.int64())]
        if g.num_rows == 0:
            return pa.schema(fields).empty_table()
        et = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        hr = g.column("hr").to_numpy(zero_copy_only=False).astype(np.int64)
        n = g.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        types, inv = np.unique(et, return_inverse=True)
        mat = np.zeros((len(types), 24), dtype=np.int64)
        np.add.at(mat, (inv, hr), n)
        cols = {"event_type": pa.array(list(types), type=pa.string())}
        for h in range(24):
            cols["h%d" % h] = pa.array(mat[:, h])
        cols["total"] = pa.array(mat.sum(axis=1))
        return pa.table(cols)

    return grouped_map(
        ds.map_batches(partial, batch_format="pyarrow"),
        "bucket",
        lambda g: pivot(g.drop_columns(["bucket"])),
        num_partitions=8,
        payload_schema=pa.schema(
            [("event_type", pa.string()), ("hr", pa.int64()), ("n", pa.int64())]
        ),
    )


SQL_HOUR_PIVOT = (
    "SELECT event_type, "
    + ", ".join(
        "CAST(count(*) FILTER (WHERE (epoch_us(ts) // 3600000000) %% 24 = %d)"
        " AS BIGINT) AS h%d" % (h, h)
        for h in range(24)
    )
    + ", CAST(count(*) AS BIGINT) AS total FROM events GROUP BY event_type"
)


def q_convoys(sf_dir):
    """Convoy / flock detection (stages/journey.py convoys): per
    unordered user pair, the maximal runs of >= 2 CONSECUTIVE hour
    buckets with a shared coarse grid cell — (user_a, user_b, n_convoys,
    longest_run). The temporal-consecutiveness upgrade of q_encounters:
    presence combiner + capped pair expansion, then a pair-keyed
    gaps-and-islands kernel; two keyed exchanges, pure int64."""
    from osm_export_tool_python_ray.stages.journey import convoys

    return convoys(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        cell_div=10,
        bucket_us=3_600_000_000,
        min_len=2,
    )


# gaps-and-islands in SQL: within a pair, hr minus the bucket's dense
# rank is constant exactly on maximal consecutive runs (same rule the
# engine's run_start boundary detects as hb[1:] != hb[:-1] + 1)
SQL_CONVOYS = """
WITH p AS (
  SELECT DISTINCT user_id,
         (event_id % 100) // 10 AS cx,
         (CAST(floor(event_id / 7.0) AS BIGINT) % 100) // 10 AS cy,
         epoch_us(ts) // 3600000000 AS hr
  FROM events
), pb AS (
  SELECT DISTINCT a.user_id AS ua, b.user_id AS ub, a.hr
  FROM p a JOIN p b
    ON a.cx = b.cx AND a.cy = b.cy AND a.hr = b.hr AND a.user_id < b.user_id
), runs AS (
  SELECT ua, ub, hr,
         hr - row_number() OVER (PARTITION BY ua, ub ORDER BY hr) AS isl
  FROM pb
), rl AS (
  SELECT ua, ub, isl, count(*) AS len
  FROM runs GROUP BY ua, ub, isl
)
SELECT ua AS user_a, ub AS user_b,
       count(*) AS n_convoys, max(len) AS longest_run
FROM rl WHERE len >= 2
GROUP BY ua, ub
"""


def q_segment_crossings(sf_dir):
    """Cross-user segment-crossing join (stages/crossings.py): per
    unordered user pair, how many trajectory segment pairs PROPERLY cross
    (both orientation products strictly negative — exact int64, the
    predicate of journey.py count_proper_crossings applied across users).
    Teleport segments (> max_step in either axis) are dropped first —
    the standard GPS-trace cleaning step that keeps segments local so
    cell blocking actually prunes. Three exchanges, all combiner-shaped:
    user-keyed (ordered segments), cell-keyed (vectorized candidate
    pairs, bbox prefilter, counted truncation cap), pair-keyed (dedup of
    multi-cell discoveries, moves only CROSSING pairs)."""
    from osm_export_tool_python_ray.stages.crossings import segment_crossings

    return segment_crossings(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        max_step=15,
        cell=16,
    )


SQL_SEGMENT_CROSSINGS = """
WITH pts AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS idx,
         CAST(event_id % 100 AS BIGINT) AS x,
         CAST(floor(event_id / 7.0) AS BIGINT) % 100 AS y
  FROM events
),
seg AS (
  SELECT p.user_id, p.x AS ax, p.y AS ay, q.x AS bx, q.y AS by_
  FROM pts p JOIN pts q ON q.user_id = p.user_id AND q.idx = p.idx + 1
  WHERE NOT (p.x = q.x AND p.y = q.y)
    AND abs(q.x - p.x) <= 15 AND abs(q.y - p.y) <= 15
),
pr AS (
  SELECT s.user_id AS user_a, t.user_id AS user_b
  FROM seg s JOIN seg t ON s.user_id < t.user_id
  WHERE ((s.bx-s.ax)*(t.ay-s.ay)-(s.by_-s.ay)*(t.ax-s.ax))
      * ((s.bx-s.ax)*(t.by_-s.ay)-(s.by_-s.ay)*(t.bx-s.ax)) < 0
    AND ((t.bx-t.ax)*(s.ay-t.ay)-(t.by_-t.ay)*(s.ax-t.ax))
      * ((t.bx-t.ax)*(s.by_-t.ay)-(t.by_-t.ay)*(s.bx-t.ax)) < 0
)
SELECT user_a, user_b, CAST(count(*) AS BIGINT) AS n_cross
FROM pr GROUP BY user_a, user_b
"""


def q_session_overlap(sf_dir):
    """Interval×interval overlap join (stages/intervals.py
    session_overlap_join): per unordered user pair, the number of
    overlapping session pairs and total overlap µs — the co-presence
    completion of the temporal-join family (asof = point←point,
    range_join = interval×point, this = interval×interval). Sessions are
    the events_sessions 30-minute-gap rule; overlaps count once via
    canonical attribution to the epoch containing the overlap start, so
    the epoch replication needs NO dedup exchange; all arithmetic exact
    int64 µs on both sides."""
    from osm_export_tool_python_ray.stages.intervals import session_overlap_join

    return session_overlap_join(_read(sf_dir, "events", ["user_id", "ts"]))


SQL_SESSION_OVERLAP = """
WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
m AS (SELECT user_id, t,
      CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 1800000000
           OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL THEN 1 ELSE 0 END AS brk
      FROM e),
g AS (SELECT user_id, t,
      sum(brk) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid
      FROM m),
ses AS (SELECT user_id, sid, min(t) AS st, max(t) AS en FROM g GROUP BY user_id, sid)
SELECT a.user_id AS user_a, b.user_id AS user_b,
       CAST(count(*) AS BIGINT) AS n_overlaps,
       CAST(sum(least(a.en, b.en) - greatest(a.st, b.st)) AS BIGINT) AS overlap_us
FROM ses a JOIN ses b
  ON a.user_id < b.user_id AND greatest(a.st, b.st) < least(a.en, b.en)
GROUP BY user_a, user_b
"""


def q_interval_coverage(sf_dir):
    """Interval-union coverage (stages/intervals.py interval_coverage):
    per user, the UNION length of the half-open intervals
    [ts, ts + floor(value·1e4+0.5)·1000 µs) — total active time counting
    overlaps once, plus merged-block and interval counts. ONE user-keyed
    exchange; the in-partition sweep is a vectorized 2n-endpoint
    segmented cumsum (depth 0→1 opens a block, →0 closes it), exact
    int64 µs on both sides. Touching intervals do NOT merge (half-open:
    a block splits when start ≥ running max of prior ends)."""
    from osm_export_tool_python_ray.stages.intervals import interval_coverage

    return interval_coverage(_read(sf_dir, "events", ["user_id", "ts", "value"]))


SQL_INTERVAL_COVERAGE = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + CAST(floor(value * 1e4 + 0.5) AS BIGINT) * 1000 AS e
  FROM events
  WHERE CAST(floor(value * 1e4 + 0.5) AS BIGINT) > 0
), marked AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
              OR s >= max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS nb
  FROM iv
), blocks AS (
  SELECT user_id, s, e,
         sum(nb) OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS UNBOUNDED PRECEDING) AS bid
  FROM marked
), blen AS (
  SELECT user_id, bid, max(e) - min(s) AS len, count(*) AS cnt
  FROM blocks GROUP BY user_id, bid
)
SELECT user_id, CAST(sum(len) AS BIGINT) AS covered_us,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(cnt) AS BIGINT) AS n_intervals
FROM blen GROUP BY user_id
"""


def q_compact_cover(sf_dir):
    """Quadtree compact cell cover (stages/journey.py compact_cover — the
    H3 ``compact`` analog): minimal multi-resolution cover of occupied
    unit cells, a parent replacing its four children recursively. One
    subtree-keyed exchange computes everything below the cut level
    (compaction is subtree-local); a second constant-key exchange folds
    the ≤4^cut fully-covered-subtree markers into the top levels."""
    from osm_export_tool_python_ray.stages.journey import compact_cover

    return compact_cover(_read(sf_dir, "events", ["event_id"]))


def _build_compact_cover_sql(top=6):
    side = 1 << top
    lines = [
        "WITH c AS (SELECT DISTINCT (event_id * 48271) %% 65537 %% %d AS c"
        " FROM events), s%d AS (SELECT CAST(c %% %d AS BIGINT) AS x,"
        " CAST(c // %d AS BIGINT) AS y FROM c)" % (side * side, top, side, side)
    ]
    for k in range(top - 1, -1, -1):
        lines.append(
            "s%d AS (SELECT x // 2 AS x, y // 2 AS y FROM s%d"
            " GROUP BY x // 2, y // 2 HAVING count(*) = 4)" % (k, k + 1)
        )
    parts = []
    for k in range(top, 0, -1):
        parts.append(
            "SELECT CAST(%d AS BIGINT) AS res, a.x AS cx, a.y AS cy FROM s%d a"
            " LEFT JOIN s%d p ON p.x = a.x // 2 AND p.y = a.y // 2"
            " WHERE p.x IS NULL" % (k, k, k - 1)
        )
    parts.append("SELECT CAST(0 AS BIGINT) AS res, x AS cx, y AS cy FROM s0")
    return ",\n".join(lines) + "\n" + "\nUNION ALL\n".join(parts)


SQL_COMPACT_COVER = _build_compact_cover_sql()



def q_cusum_bursts(sf_dir):
    """CUSUM burst detection (stages/changepoint.py cusum_bursts): per
    type, the count of hours whose one-sided CUSUM exceeds 3k (k = ceil
    dense-axis mean), first alarmed hour and max alarmed statistic.
    The sequential recursion is closed by the drawdown identity
    S = cumsum − running-min, so the engine side is one vectorized pass
    per type and the oracle is two window functions — identical exact
    int64 arithmetic, no recursive CTE."""
    from osm_export_tool_python_ray.stages.changepoint import cusum_bursts

    return cusum_bursts(_read(sf_dir, "events", ["event_type", "ts"]))


SQL_CUSUM_BURSTS = """
WITH hc AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, hr
),
bounds AS (
  SELECT event_type, min(hr) AS h0, max(hr) AS h1, CAST(sum(n) AS BIGINT) AS total
  FROM hc GROUP BY event_type
),
dense AS (
  SELECT b.event_type,
         unnest(generate_series(b.h0, b.h1)) AS hr,
         (b.total + (b.h1 - b.h0 + 1) - 1) // (b.h1 - b.h0 + 1) AS k
  FROM bounds b
),
x AS (
  SELECT d.event_type, d.hr, d.k, coalesce(hc.n, 0) - d.k AS d_t
  FROM dense d LEFT JOIN hc ON hc.event_type = d.event_type AND hc.hr = d.hr
),
p AS (
  SELECT event_type, hr, k,
         sum(d_t) OVER (PARTITION BY event_type ORDER BY hr ROWS UNBOUNDED PRECEDING) AS pt
  FROM x
),
m AS (
  SELECT event_type, hr, k, pt,
         least(CAST(0 AS BIGINT),
               min(pt) OVER (PARTITION BY event_type ORDER BY hr ROWS UNBOUNDED PRECEDING)) AS mt
  FROM p
),
al AS (
  SELECT event_type, hr, pt - mt AS s
  FROM m WHERE pt - mt > 3 * k
)
SELECT b.event_type,
       CAST(coalesce(count(al.hr), 0) AS BIGINT) AS n_alarms,
       CAST(coalesce(min(al.hr), -1) AS BIGINT) AS first_hr,
       CAST(coalesce(max(al.s), 0) AS BIGINT) AS s_max
FROM bounds b LEFT JOIN al ON al.event_type = b.event_type
GROUP BY b.event_type
"""


def q_reciprocal_partners(sf_dir):
    """Mutual top-partner matching (stages/journey.py
    reciprocal_partners): the reciprocal-nearest-neighbor primitive over
    the encounter graph — each user's strongest co-presence partner
    (n_shared desc, partner asc), kept iff mutual. Two tiny keyed hops
    after the encounters combiner exchange; O(users) rows move."""
    from osm_export_tool_python_ray.stages.journey import reciprocal_partners

    return reciprocal_partners(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        cell_div=10,
        bucket_us=3_600_000_000,
    )


SQL_RECIPROCAL_PARTNERS = """
WITH p0 AS (
  SELECT DISTINCT user_id,
         (event_id % 100) // 10 AS cx,
         (CAST(floor(event_id / 7.0) AS BIGINT) % 100) // 10 AS cy,
         epoch_us(ts) // 3600000000 AS hr
  FROM events
),
e AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM p0 a JOIN p0 b
    ON a.cx = b.cx AND a.cy = b.cy AND a.hr = b.hr AND a.user_id < b.user_id
  GROUP BY a.user_id, b.user_id
),
d AS (
  SELECT user_a AS u, user_b AS p, n_shared AS w FROM e
  UNION ALL
  SELECT user_b AS u, user_a AS p, n_shared AS w FROM e
),
t AS (
  SELECT u, p, w,
         row_number() OVER (PARTITION BY u ORDER BY w DESC, p ASC) AS rn
  FROM d
)
SELECT a.u AS user_a, a.p AS user_b, a.w AS n_shared
FROM t a JOIN t b ON b.u = a.p AND b.p = a.u
WHERE a.rn = 1 AND b.rn = 1 AND a.u < a.p
"""


def q_cell_trends(sf_dir):
    """Grouped exact-integer least squares (stages/analytics.py
    cell_trends): per grid cell, the linear trend of hourly activity as
    the exact rational slope (num, den) from integer sufficient
    statistics — no division on either side (numpy floors, DuckDB
    truncates: emitting the fraction sidesteps the divergence class
    entirely). Combiner partials, one cell-keyed exchange, reduceat
    moment fold."""
    from osm_export_tool_python_ray.stages.analytics import cell_trends

    return cell_trends(_read(sf_dir, "events", ["event_id", "ts"]))


SQL_CELL_TRENDS = """
WITH hc AS (
  SELECT ((event_id % 100) // 10) * 10
         + ((CAST(floor(event_id / 7.0) AS BIGINT) % 100) // 10) AS ckey,
         epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY ckey, hr
),
xb AS (
  SELECT ckey, hr - min(hr) OVER (PARTITION BY ckey) AS x, n FROM hc
)
SELECT ckey, CAST(count(*) AS BIGINT) AS n_hours,
       CAST(count(*) * sum(x * n) - sum(x) * sum(n) AS BIGINT) AS num,
       CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS den
FROM xb GROUP BY ckey
"""


def q_sliding_distinct(sf_dir):
    """Sliding-window COUNT DISTINCT (stages/temporal.py
    sliding_distinct_users): distinct users per event_type in the
    trailing 3-hour window, via the presence-run trick — each distinct
    (type, hour, user) presence row represents the user for exactly the
    window-ends up to the user's next presence, accumulated through a
    difference array. One keyed exchange of presence rows; no per-window
    set is ever built on either side."""
    from osm_export_tool_python_ray.stages.temporal import sliding_distinct_users

    return sliding_distinct_users(
        _read(sf_dir, "events", ["event_type", "user_id", "ts"])
    )


SQL_SLIDING_DISTINCT = """
WITH pres AS (
  SELECT DISTINCT event_type, epoch_us(ts) // 3600000000 AS hr, user_id
  FROM events
),
off(o) AS (VALUES (0), (1), (2)),
w AS (SELECT event_type, hr + o AS wh, user_id FROM pres CROSS JOIN off)
SELECT event_type, wh AS hr, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM w GROUP BY event_type, wh
"""


def q_tag_cooccurrence(sf_dir):
    """OSM tag-KEY co-occurrence over the deduped corpus elements
    (export-surface analytics): the 20 most frequent unordered key pairs
    appearing on the same element — (k1, k2, n) by (n desc, k1, k2). One
    per-batch pair combiner over the tags map column (vectorized
    repeat/cumsum expansion of within-element SORTED keys, so k1 < k2 by
    construction), a tiny (k1, k2) groupby, and a distributed
    sort+limit(20) — the key-pair table is bounded by the tag vocabulary
    squared, never by element count."""
    import ray.data

    from ray.data.aggregate import Sum

    from osm_export_tool_python_ray.stages.explode import dedup_elements, explode_osm

    ds = ray.data.read_parquet(corpus_path(n_shards=4)).map_batches(
        explode_osm, batch_format="pyarrow"
    )
    deduped = dedup_elements(ds, num_buckets=8)

    def pair_partial(t: pa.Table) -> pa.Table:
        EMPTY = pa.table(
            {
                "k1": pa.array([], type=pa.string()),
                "k2": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
        if t.num_rows == 0:
            return EMPTY
        tags = t.column("tags")
        if isinstance(tags, pa.ChunkedArray):
            tags = tags.combine_chunks()
        offs = tags.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.asarray(tags.keys.to_pylist(), dtype=object)
        m = np.diff(offs)
        if not len(keys):
            return EMPTY
        # sort keys WITHIN each element so expanded pairs are (k1 < k2)
        elem = np.repeat(np.arange(len(m)), m)
        order = np.lexsort((keys, elem))
        keys = keys[order]
        starts = offs[:-1][m > 0]
        sizes = m[m > 0]
        rank = np.arange(len(keys)) - np.repeat(starts, sizes)
        left_counts = np.repeat(sizes, sizes) - 1 - rank
        total = int(left_counts.sum())
        if total == 0:
            return EMPTY
        L = np.repeat(np.arange(len(keys)), left_counts)
        poffs = np.concatenate([[np.int64(0)], np.cumsum(left_counts)])[:-1]
        R = np.arange(total) - np.repeat(poffs, left_counts) + L + 1
        pt = pa.table(
            {
                "k1": pa.array(list(keys[L]), type=pa.string()),
                "k2": pa.array(list(keys[R]), type=pa.string()),
            }
        )
        agg = pt.group_by(["k1", "k2"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "k1": agg.column("k1"),
                "k2": agg.column("k2"),
                "n": agg.column("count_all"),
            }
        )

    return (
        deduped.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["k1", "k2"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "k1", "k2"], descending=[True, False, False])
        .limit(20)
    )


def _sql_tag_cooccurrence():
    from osm_export_tool_python_ray.pipelines.export_oracle import _base_ctes

    # only the raw/el prefix of the shared base CTEs is needed
    base = _base_ctes(corpus_path(n_shards=4))
    cut = base.index("nodes AS (")
    prefix = base[:cut].rstrip().rstrip(",")
    return (
        "WITH "
        + prefix.split("WITH", 1)[-1].lstrip()
        + """,
tk AS (
  SELECT etype, id, UNNEST(json_keys(json_extract(txt, '$.tags'))) AS k
  FROM el
),
p AS (
  SELECT a.k AS k1, b.k AS k2
  FROM tk a JOIN tk b ON a.etype = b.etype AND a.id = b.id AND a.k < b.k
)
SELECT k1, k2, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY k1, k2
ORDER BY n DESC, k1, k2 LIMIT 20
"""
    )


def q_session_bigrams(sf_dir):
    """Order-1 sequential pattern mining (stages/journey.py
    session_bigrams): top-15 consecutive event-type pairs within a
    session (30-min gap rule), ties broken (n desc, a, b). One
    user-keyed exchange; |types|²-bounded tail."""
    from osm_export_tool_python_ray.stages.journey import session_bigrams

    return session_bigrams(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    )


SQL_SESSION_BIGRAMS = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t, event_id, event_type FROM events
),
l AS (
  SELECT user_id, t, event_type,
         lag(event_type) OVER w AS prev_et,
         lag(t) OVER w AS prev_t
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
bg AS (
  SELECT prev_et AS a, event_type AS b
  FROM l WHERE prev_et IS NOT NULL AND t - prev_t <= 1800000000
)
SELECT a, b, CAST(count(*) AS BIGINT) AS n
FROM bg GROUP BY a, b
ORDER BY n DESC, a, b LIMIT 15
"""


def q_attribution(sf_dir):
    """Forward attribution window (stages/temporal.py
    attribution_window): per click hour, how many clicks converted to a
    purchase by the SAME user strictly later but within 1 h — the
    forward mirror of the AS-OF join, closed with the same vectorized
    index-accumulate (next-target per row in one pass, no self-join).
    Same-microsecond purchases do not convert on either side."""
    from osm_export_tool_python_ray.stages.temporal import attribution_window

    return attribution_window(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    )


SQL_ATTRIBUTION = """
WITH c AS (
  SELECT user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'purchase'
)
SELECT c.t // 3600000000 AS hr,
       CAST(count(*) AS BIGINT) AS n_clicks,
       CAST(sum(CASE WHEN EXISTS (
             SELECT 1 FROM p
             WHERE p.user_id = c.user_id
               AND p.t > c.t AND p.t <= c.t + 3600000000)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM c GROUP BY hr
"""


def q_activity_histogram(sf_dir):
    """Power-law activity histogram: per-user event totals bucketed into
    exact log2 bins (bin = floor(log2 n) via integer bit-length — no
    float log on either side; DuckDB mirrors with length(bin(n))-1) →
    (bin, n_users, total_events). The concentration profile a corpus
    audit reads before choosing sampling rates. Per-batch user-count
    combiner, one user groupby, then the ≤64-row bin fold."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        uu, cnt = np.unique(u, return_counts=True)
        return pa.table(
            {
                "user_id": pa.array(uu.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    per_user = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n"))
    )

    def binned(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        # floor(log2 n) = frexp exponent − 1: exact for counts < 2^53
        # (float64 conversion is lossless there; a per-user event count
        # beyond 9e15 is not a real workload)
        _m, e = np.frexp(n.astype(np.float64))
        b = e.astype(np.int64) - 1
        return pa.table({"bin": pa.array(b), "n": pa.array(n)})

    return (
        per_user.map_batches(binned, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Count(alias_name="n_users"), Sum("n", alias_name="total_events"))
    )


SQL_ACTIVITY_HISTOGRAM = """
WITH pu AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id
)
SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(n) AS BIGINT) AS total_events
FROM pu GROUP BY 1
"""


def q_cube_rollup(sf_dir):
    """GROUP BY CUBE(event_type, hour-of-day, cell) in one pass
    (stages/olap.py cube_rollup): all 8 grouping sets with '*'/-1
    sentinels on rolled-up axes; value sums in int64 cents (quantize-
    then-sum). The raw stream is touched once; both exchanges move only
    aggregate-cardinality rows."""
    from osm_export_tool_python_ray.stages.olap import cube_rollup

    return cube_rollup(
        _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
    )


SQL_CUBE_ROLLUP = """
SELECT coalesce(event_type, '*') AS et,
       coalesce(hod, -1) AS hod,
       coalesce(cell, -1) AS cell,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sumv
FROM (
  SELECT event_type,
         (epoch_us(ts) // 3600000000) % 24 AS hod,
         (event_id % 100) // 10 AS cell,
         value
  FROM events
)
GROUP BY CUBE(event_type, hod, cell)
"""


def q_skyline(sf_dir):
    """Group-wise Pareto frontier (stages/olap.py skyline): per
    day-of-week, the users not dominated on (event count, int64-cent
    value sum) — two-phase distributed skyline: partition-local
    sort-sweep frontier, then a tiny dow-keyed merge sweep."""
    from osm_export_tool_python_ray.stages.olap import skyline

    return skyline(_read(sf_dir, "events", ["ts", "user_id", "value"]))


SQL_SKYLINE = """
WITH agg AS (
  SELECT user_id,
         (epoch_us(ts) // 86400000000) % 7 AS dow,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sumv
  FROM events GROUP BY 1, 2
)
SELECT dow, user_id, n_events, sumv FROM agg a
WHERE NOT EXISTS (
  SELECT 1 FROM agg b
  WHERE b.dow = a.dow
    AND b.n_events >= a.n_events AND b.sumv >= a.sumv
    AND (b.n_events > a.n_events OR b.sumv > a.sumv)
)
"""


def q_editdist_pairs(sf_dir):
    """Edit-distance-1 similarity join over distinct part names
    (stages/editdist.py editdist_pairs, FastSS deletion-neighborhood
    blocking + vectorized byte-matrix verify): (name_a, name_b, n_a,
    n_b) for every unordered distinct-name pair at Levenshtein distance
    exactly 1."""
    from osm_export_tool_python_ray.stages.editdist import editdist_pairs

    return editdist_pairs(_read(sf_dir, "part", ["p_name"]))


SQL_EDITDIST_PAIRS = """
WITH d AS (
  SELECT p_name, CAST(count(*) AS BIGINT) AS n FROM part GROUP BY p_name
)
SELECT a.p_name AS name_a, b.p_name AS name_b, a.n AS n_a, b.n AS n_b
FROM d a JOIN d b
  ON a.p_name < b.p_name AND levenshtein(a.p_name, b.p_name) = 1
"""


def q_group_ntile(sf_dir):
    """Exact distributed NTILE(10) per event_type (stages/scan.py
    group_ntile): per-row decile assignment by (int64-cent value,
    event_id) — two-phase rank scan with O(|types| x num_buckets)
    driver state, one keyed exchange."""
    from osm_export_tool_python_ray.stages.scan import group_ntile

    return group_ntile(_read(sf_dir, "events", ["event_id", "event_type", "value"]))


SQL_GROUP_NTILE = """
SELECT event_id, event_type,
       CAST(ntile(10) OVER (
         PARTITION BY event_type
         ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT), event_id
       ) AS BIGINT) AS tile
FROM events
"""


def q_neardup_degree(sf_dir):
    """Near-dup graph degree distribution (dedup-threshold calibration
    surface): hyperplane-LSH cosine pairs at threshold 0.2 → per-vector
    degree → (degree, n_vecs). The profile a dedup run reads to pick its
    similarity cutoff: a long high-degree tail means the threshold is
    merging clusters. Pairs expand both directions; two tiny groupbys on
    O(pairs) rows."""
    from ray.data.aggregate import Count

    from osm_export_tool_python_ray.stages.ann import embedding_near_dup

    pairs = embedding_near_dup(
        _read(sf_dir, "embeddings"), threshold=0.2, num_planes=4, num_buckets=16
    )

    def both(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        return pa.table({"v": pa.array(np.concatenate([a, b]).astype(np.int64))})

    return (
        pairs.map_batches(both, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Count(alias_name="degree"))
        .groupby("degree")
        .aggregate(Count(alias_name="n_vecs"))
    )


SQL_NEARDUP_DEGREE = """
WITH pr AS (%s),
d AS (SELECT doc_a AS v FROM pr UNION ALL SELECT doc_b AS v FROM pr),
deg AS (SELECT v, CAST(count(*) AS BIGINT) AS degree FROM d GROUP BY v)
SELECT degree, CAST(count(*) AS BIGINT) AS n_vecs FROM deg GROUP BY degree
""" % _build_embedding_near_dup_sql(threshold=0.2)


def q_spatial_autocorr(sf_dir):
    """Spatial-autocorrelation partials (stages/hotspots.py
    moran_partials): ONE row of the six int64 sums Moran's I needs over
    res-8 occupied-cell counts with rook weights — n_cells, sum_n,
    sum_n2, n_pairs (ordered occupied-neighbor pairs), pair_prod
    (sum of c_i*c_j over those pairs), deg_n (sum of c_i*deg_i). Points
    collapse to cell aggregates before any exchange; the x5 rook
    replication runs on the cell table."""
    from osm_export_tool_python_ray.stages.hotspots import moran_partials

    return moran_partials(
        _read(sf_dir, "customer", ["c_custkey"]).map_batches(
            _customer_points, batch_format="pyarrow"
        ),
        res=8,
    )


SQL_SPATIAL_AUTOCORR = """
WITH pts AS (
  SELECT (c_custkey % 100) * 0.01 AS lon,
         (CAST(floor(c_custkey / 7.0) AS BIGINT) % 100) * 0.01 AS lat
  FROM customer
), i8 AS (
  SELECT CAST(floor((lon + 180.0) * 32768.0 / 360.0) AS BIGINT) AS ix,
         CAST(floor((lat + 90.0) * 32768.0 / 360.0) AS BIGINT) AS iy
  FROM pts
), cellagg AS (
  SELECT ix, iy, count(*) AS n FROM i8 GROUP BY ix, iy
), nb AS (
  SELECT a.n AS an, b.n AS bn
  FROM cellagg a JOIN cellagg b
    ON (a.ix = b.ix AND abs(a.iy - b.iy) = 1)
    OR (a.iy = b.iy AND abs(a.ix - b.ix) = 1)
), base AS (
  SELECT count(*) AS n_cells,
         CAST(sum(n) AS BIGINT) AS sum_n,
         CAST(sum(n * n) AS BIGINT) AS sum_n2
  FROM cellagg
), pr AS (
  SELECT count(*) AS n_pairs,
         CAST(coalesce(sum(an * bn), 0) AS BIGINT) AS pair_prod,
         CAST(coalesce(sum(an), 0) AS BIGINT) AS deg_n
  FROM nb
)
SELECT base.n_cells, base.sum_n, base.sum_n2,
       pr.n_pairs, pr.pair_prod, pr.deg_n
FROM base, pr
"""


# Z-order rectangle: engine filters by CURVE INTERVALS only; the oracle
# filters by the plain rectangle and re-derives the Morton code — hash
# equality proves the quadtree decomposition covers exactly the rect.
_ZQ = (23, 61, 17, 76)  # xlo, xhi, ylo, yhi (inclusive, non-aligned)


def q_zorder_range(sf_dir):
    """Space-filling-curve range query (stages/zorder.py
    zorder_range_query): the rectangle is decomposed driver-side into
    disjoint Morton intervals (O(perimeter) state, broadcast in the
    closure), points are kept by a vectorized searchsorted membership
    test on the curve code ALONE — the x/y predicate never runs engine
    side — then folded per 8×8 Z-block with per-batch partials. This is
    the pruning contract of a curve-sorted Lance/parquet table: row
    groups are skipped by Morton min/max, never by per-row rectangles."""
    from osm_export_tool_python_ray.stages.zorder import zorder_range_query

    return zorder_range_query(
        _read(sf_dir, "events", ["event_id"]), *_ZQ
    )


def _sql_morton(x, y, bits=7):
    """Morton interleave as integer SQL: bit b of x -> 2b, of y -> 2b+1
    (matches stages/zorder.py morton_encode bit-for-bit)."""
    terms = []
    for b in range(bits):
        terms.append("((%s // %d) %% 2) * %d" % (x, 1 << b, 1 << (2 * b)))
        terms.append("((%s // %d) %% 2) * %d" % (y, 1 << b, 1 << (2 * b + 1)))
    return " + ".join(terms)


SQL_ZORDER_RANGE = f"""
WITH pts AS (
  SELECT event_id,
         CAST(event_id % 100 AS BIGINT) AS x,
         CAST(floor(event_id / 7.0) AS BIGINT) % 100 AS y
  FROM events
), sel AS (
  SELECT event_id, ({_sql_morton("x", "y")}) AS m
  FROM pts
  WHERE x BETWEEN {_ZQ[0]} AND {_ZQ[1]} AND y BETWEEN {_ZQ[2]} AND {_ZQ[3]}
)
SELECT m // 64 AS qkey,
       count(*) AS n,
       CAST(sum(event_id) AS BIGINT) AS id_sum
FROM sel GROUP BY qkey
"""


def q_map_match(sf_dir):
    """Map matching (stages/mapmatch.py map_match): snap every
    non-road-user probe point to the nearest road segment inside a
    RADIUS-expanded bbox corridor. Road network = trajectories of
    user_id % 17 == 0 users (one user-keyed exchange to order them),
    broadcast as a cell->segment CSR index via ray.put (the
    decontamination small-side shape); probes stream through one
    stateless map_batches — candidate gather by searchsorted, exact
    scaled-integer point-to-segment distance (floor-division interior
    case), two masked reduceat passes for the (d2q, seg_id) argmin."""
    from osm_export_tool_python_ray.stages.mapmatch import map_match

    return map_match(_read(sf_dir, "events", ["event_id", "user_id", "ts"]))


SQL_MAP_MATCH = """
WITH rd AS (
  SELECT user_id, event_id,
         CAST(event_id % 100 AS BIGINT) AS x,
         CAST(floor(event_id / 7.0) AS BIGINT) % 100 AS y,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE user_id % 17 = 0
), seg0 AS (
  SELECT event_id AS seg_id, x AS ax, y AS ay,
         lead(x) OVER w AS bx, lead(y) OVER w AS by2
  FROM rd WINDOW w AS (PARTITION BY user_id ORDER BY rn)
), segs AS (
  SELECT seg_id, ax, ay, bx, by2 FROM seg0
  WHERE bx IS NOT NULL AND abs(bx - ax) <= 20 AND abs(by2 - ay) <= 20
), pts AS (
  SELECT event_id,
         CAST(event_id % 100 AS BIGINT) AS px,
         CAST(floor(event_id / 7.0) AS BIGINT) % 100 AS py
  FROM events WHERE user_id % 17 <> 0
), cand AS (
  SELECT p.event_id, s.seg_id,
         s.bx - s.ax AS dx, s.by2 - s.ay AS dy,
         p.px - s.ax AS pxa, p.py - s.ay AS pya,
         p.px - s.bx AS pxb, p.py - s.by2 AS pyb
  FROM pts p JOIN segs s
    ON p.px BETWEEN least(s.ax, s.bx) - 10 AND greatest(s.ax, s.bx) + 10
   AND p.py BETWEEN least(s.ay, s.by2) - 10 AND greatest(s.ay, s.by2) + 10
), scored AS (
  SELECT event_id, seg_id,
    CASE
      WHEN dx*dx + dy*dy = 0 OR dx*pxa + dy*pya <= 0
        THEN (pxa*pxa + pya*pya) * 1048576
      WHEN dx*pxa + dy*pya >= dx*dx + dy*dy
        THEN (pxb*pxb + pyb*pyb) * 1048576
      ELSE ((dx*pya - dy*pxa) * (dx*pya - dy*pxa) * 1048576)
           // (dx*dx + dy*dy)
    END AS d2q
  FROM cand
), ranked AS (
  SELECT event_id, seg_id, d2q,
         row_number() OVER (PARTITION BY event_id ORDER BY d2q, seg_id) AS rk
  FROM scored
)
SELECT event_id, seg_id, d2q FROM ranked WHERE rk = 1
"""


def q_shard_assign(sf_dir):
    """Rendezvous-hash shard assignment (stages/shard.py shard_assign):
    each doc's owner shard is the highest-random-weight argmax over 16
    shards (splitmix64 avalanche of the wrapping-u64 key·K1 + s·K2;
    weight DESC, shard ASC). Pure function of the key — no data
    exchange; per-batch partials fold to ≤16 rows before the groupby.
    The minimal-movement property (removing a shard moves only its own
    keys) is pinned by tests/test_shard.py."""
    from osm_export_tool_python_ray.stages.shard import shard_assign

    return shard_assign(_read(sf_dir, "documents", ["doc_id"]))


def _build_shard_assign_sql():
    base = (
        "CAST((CAST({m} AS HUGEINT) + CAST(s AS HUGEINT)"
        " * CAST('13787848793156543929' AS HUGEINT))"
        " % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT)"
    ).format(
        m=_sql_mulmod64(
            "CAST(doc_id AS UBIGINT)", "CAST('11400714819323198485' AS UBIGINT)"
        )
    )
    return """
WITH w0 AS (
  SELECT doc_id, s, {base} AS b
  FROM documents
  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS s)
), w1 AS (
  SELECT doc_id, s, {mix} AS wt FROM w0
), ranked AS (
  SELECT doc_id, s,
         row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, s) AS rk
  FROM w1
)
SELECT s AS shard, count(*) AS n,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM ranked WHERE rk = 1 GROUP BY s
""".format(base=base, mix=_sql_mix64("b"))


SQL_SHARD_ASSIGN = _build_shard_assign_sql()


def q_cell_peak_hour(sf_dir):
    """Space-time-cube peak hour (stages/journey.py cell_peak_hour):
    per 10×10 grid cell the busiest hour-of-day, smallest-hour
    tie-break, plus peak and total counts. The per-cell argmax is a
    packed Max aggregate ((n<<5)|(31-hour)) so both exchanges move only
    bounded aggregate tables — no window pass, no event-row shuffle."""
    from osm_export_tool_python_ray.stages.journey import cell_peak_hour

    return cell_peak_hour(_read(sf_dir, "events", ["event_id", "ts"]))


SQL_CELL_PEAK_HOUR = """
WITH pts AS (
  SELECT CAST(event_id % 100 AS BIGINT) // 10 AS cx,
         (CAST(floor(event_id / 7.0) AS BIGINT) % 100) // 10 AS cy,
         ((epoch_us(ts) // 3600000000) % 24 + 24) % 24 AS hod
  FROM events
), ch AS (
  SELECT cx, cy, hod, count(*) AS n FROM pts GROUP BY cx, cy, hod
), ranked AS (
  SELECT cx, cy, hod, n,
         row_number() OVER (PARTITION BY cx, cy ORDER BY n DESC, hod) AS rk,
         CAST(sum(n) OVER (PARTITION BY cx, cy) AS BIGINT) AS n_total
  FROM ch
)
SELECT cx, cy, hod AS peak_hour, n AS n_peak, n_total
FROM ranked WHERE rk = 1
"""


def q_media_near_dup(sf_dir):
    """Perceptual media near-dup (stages/media.py media_near_dup): each
    doc renders its family's PPM pattern shifted by a per-doc brightness
    offset; an actor-pool stage STRICT-decodes the payload and computes a
    64-bit average hash with exact integer cross-multiplication (bit =
    blocksum·N > totalsum·blockcnt — constant shifts cancel EXACTLY, no
    float means), then one groupby over (signature) aggregate rows. The
    oracle re-derives every bit from the closed-form block sums of the
    ramp+stripe pattern (no pixel enumeration), so hash equality proves
    decode → pixel math → hash → invariance end-to-end."""
    from osm_export_tool_python_ray.stages.media import media_near_dup

    return media_near_dup(_read(sf_dir, "documents", ["doc_id"]))


def _build_media_near_dup_sql(families=97):
    powers = ", ".join(
        "(%d, CAST('%d' AS HUGEINT))" % (k, 1 << k) for k in range(64)
    )
    stripe = "(({x} // p) * (p // 2) + least({x} % p, p // 2))"
    return """
WITH fams AS (
  SELECT DISTINCT doc_id % {F} AS fam FROM documents
), fs AS (
  SELECT fam, ({le}) % CAST(4294967296 AS UBIGINT) AS seed
  FROM (SELECT fam, md5('img:' || CAST(fam AS VARCHAR)) AS h FROM fams)
), dims AS (
  SELECT fam,
         CAST(16 + seed % 17 AS BIGINT) AS h,
         CAST(16 + (seed // 256) % 23 AS BIGINT) AS w,
         CAST(16 + (seed // 65536) % 16 AS BIGINT) AS amp,
         CAST(4 + (seed // 4096) % 5 AS BIGINT) AS p
  FROM fs
), powers(k, pw) AS (VALUES {powers}),
blocks AS (
  SELECT fam, h, w, amp, p, bi, bj,
         (bi * h) // 8 AS i0, ((bi + 1) * h) // 8 AS i1,
         (bj * w) // 8 AS j0, ((bj + 1) * w) // 8 AS j1
  FROM dims
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bi)
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bj)
), scored AS (
  SELECT fam, bi, bj,
         (i1 - i0) * (j1 - j0) AS cnt,
         ((i1 - i0) * (i0 + i1 - 1) // 2) * (j1 - j0)
           + 2 * ((j1 - j0) * (j0 + j1 - 1) // 2) * (i1 - i0)
           + amp * ({f_i1} - {f_i0}) * (j1 - j0) AS a,
         w * (h * (h - 1) // 2) + h * w * (w - 1)
           + amp * {f_h} * w AS g,
         h * w AS n
  FROM blocks
), famsig AS (
  SELECT fam,
         sum(CASE WHEN a * n > g * cnt THEN pw
                  ELSE CAST('0' AS HUGEINT) END) AS s
  FROM scored JOIN powers ON powers.k = bi * 8 + bj
  GROUP BY fam
), sigs AS (
  SELECT fam,
         CAST(CASE WHEN s >= CAST('9223372036854775808' AS HUGEINT)
                   THEN s - CAST('18446744073709551616' AS HUGEINT)
                   ELSE s END AS BIGINT) AS sig
  FROM famsig
)
SELECT sig, count(*) AS n_docs, min(doc_id) AS min_doc,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM documents d JOIN sigs ON d.doc_id % {F} = sigs.fam
GROUP BY sig
""".format(
        F=families,
        le=_le64_expr("h"),
        powers=powers,
        f_i1=stripe.format(x="i1"),
        f_i0=stripe.format(x="i0"),
        f_h=stripe.format(x="h"),
    )


SQL_MEDIA_NEAR_DUP = _build_media_near_dup_sql()


# integer hexagon AOI for the raster-cover query; shared literal between
# the engine call and the SQL edge list
_COVER_POLY = [(10, 50), (35, 10), (75, 15), (90, 55), (60, 90), (25, 85)]


def q_aoi_cell_cover(sf_dir):
    """Polygon raster cover (stages/journey.py aoi_cell_cover): per-cell
    event counts for cells whose center passes the exact-integer
    ray-crossing test against a broadcast hexagon AOI. Events fold to
    per-cell aggregates per batch; the PIP filter runs on the bounded
    cell table — the raster-side counterpart of the export pipeline's
    vector AOI clipping."""
    from osm_export_tool_python_ray.stages.journey import aoi_cell_cover

    return aoi_cell_cover(_read(sf_dir, "events", ["event_id"]), _COVER_POLY)


def _build_aoi_cell_cover_sql(poly=_COVER_POLY):
    edges = ", ".join(
        "(%d, %d, %d, %d)"
        % (poly[i][0], poly[i][1], poly[(i + 1) % len(poly)][0], poly[(i + 1) % len(poly)][1])
        for i in range(len(poly))
    )
    return """
WITH pts AS (
  SELECT event_id,
         CAST(event_id % 100 AS BIGINT) // 10 AS cx,
         (CAST(floor(event_id / 7.0) AS BIGINT) % 100) // 10 AS cy
  FROM events
), cc AS (
  SELECT cx, cy, count(*) AS n, CAST(sum(event_id) AS BIGINT) AS id_sum
  FROM pts GROUP BY cx, cy
), edges(x1, y1, x2, y2) AS (VALUES {edges}),
pip AS (
  SELECT cx, cy, n, id_sum,
         sum(CASE WHEN (y1 > 10 * cy + 5) <> (y2 > 10 * cy + 5)
                   AND ((y2 > y1 AND (10 * cy + 5 - y1) * (x2 - x1)
                           - (10 * cx + 5 - x1) * (y2 - y1) > 0)
                     OR (y2 < y1 AND (10 * cy + 5 - y1) * (x2 - x1)
                           - (10 * cx + 5 - x1) * (y2 - y1) < 0))
                  THEN 1 ELSE 0 END) AS crossings
  FROM cc CROSS JOIN edges
  GROUP BY cx, cy, n, id_sum
)
SELECT cx, cy, n, id_sum FROM pip WHERE crossings % 2 = 1
""".format(edges=edges)


SQL_AOI_CELL_COVER = _build_aoi_cell_cover_sql()

def q_geofence_dwell(sf_dir):
    """Geofence enter/exit state machine (stages/journey.py
    geofence_dwell): per user, separate visits to the hexagon AOI
    (maximal in-fence runs in (ts, event_id) order), in-fence event count
    and total dwell µs. PIP flags resolve per batch BEFORE the one
    user-keyed exchange; episode detection is a vectorized boundary scan.
    Exact int64 end to end (points_in_polygon shared-spec PIP rule)."""
    from osm_export_tool_python_ray.stages.journey import geofence_dwell

    return geofence_dwell(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]), _COVER_POLY
    )


def _build_geofence_dwell_sql(poly=_COVER_POLY):
    edges = ", ".join(
        "(%d, %d, %d, %d)"
        % (poly[i][0], poly[i][1], poly[(i + 1) % len(poly)][0], poly[(i + 1) % len(poly)][1])
        for i in range(len(poly))
    )
    return """
WITH p AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CAST(event_id % 100 AS BIGINT) AS x,
         CAST(floor(event_id / 7.0) AS BIGINT) % 100 AS y
  FROM events
), edges(x1, y1, x2, y2) AS (VALUES {edges}),
flags AS (
  SELECT user_id, event_id, t,
         (sum(CASE WHEN (y1 > y) <> (y2 > y)
                    AND ((y2 > y1 AND (y - y1) * (x2 - x1) - (x - x1) * (y2 - y1) > 0)
                      OR (y2 < y1 AND (y - y1) * (x2 - x1) - (x - x1) * (y2 - y1) < 0))
                   THEN 1 ELSE 0 END) % 2 = 1) AS inside
  FROM p CROSS JOIN edges
  GROUP BY user_id, event_id, t, x, y
),
seq AS (
  SELECT user_id, event_id, t, inside,
         CASE WHEN inside AND coalesce(NOT lag(inside) OVER w, TRUE)
              THEN 1 ELSE 0 END AS entry
  FROM flags WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
ep AS (
  SELECT user_id, t, inside,
         sum(entry) OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS UNBOUNDED PRECEDING) AS epi
  FROM seq
),
dw AS (
  SELECT user_id, epi, max(t) - min(t) AS dwell, count(*) AS ninside
  FROM ep WHERE inside GROUP BY user_id, epi
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_episodes,
       CAST(sum(ninside) AS BIGINT) AS n_inside,
       CAST(sum(dwell) AS BIGINT) AS dwell_us
FROM dw GROUP BY user_id
""".format(edges=edges)


SQL_GEOFENCE_DWELL = _build_geofence_dwell_sql()


def q_triangles(sf_dir):
    """Co-location triangle counts (stages/graph.py
    colocation_triangles): per-user triangle participation on the
    encounter graph (edges = pairs with ≥2 shared (cell, hour) groups).
    Wedges emit once from each triangle's smallest node (counted once),
    close against the edge set through ONE tagged (v, w)-keyed exchange
    (the asof trick — no broadcast, no driver state), with the
    quadratic wedge expansion capped+counted per center."""
    from osm_export_tool_python_ray.stages.graph import colocation_triangles

    return colocation_triangles(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    )


SQL_TRIANGLES = """
WITH p AS (
  SELECT DISTINCT user_id,
         (event_id % 100) // 10 AS cx,
         (CAST(floor(event_id / 7.0) AS BIGINT) % 100) // 10 AS cy,
         epoch_us(ts) // 3600000000 AS hr
  FROM events
), e0 AS (
  SELECT a.user_id AS ua, b.user_id AS ub
  FROM p a JOIN p b
    ON a.cx = b.cx AND a.cy = b.cy AND a.hr = b.hr AND a.user_id < b.user_id
  GROUP BY a.user_id, b.user_id
  HAVING count(*) >= 2
), e0c AS (
  -- the ENGINE's wedge cap, modeled: wedges expand from the smallest
  -- node of each edge with the adjacency truncated to the 512 smallest
  -- neighbors per center (stages/graph.py colocation_triangles);
  -- closure still probes the FULL edge set
  SELECT ua, ub FROM (
    SELECT ua, ub, row_number() OVER (PARTITION BY ua ORDER BY ub) AS rk
    FROM e0
  ) WHERE rk <= 512
), tri AS (
  SELECT x.ua AS a, x.ub AS b, y.ub AS c
  FROM e0c x
  JOIN e0c y ON y.ua = x.ua AND x.ub < y.ub
  JOIN e0 e3 ON e3.ua = x.ub AND e3.ub = y.ub
), m AS (
  SELECT a AS user_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT user_id, count(*) AS n_tri FROM m GROUP BY user_id
"""


def q_hilbert_range(sf_dir):
    """Hilbert-curve range query (stages/zorder.py hilbert_range_query):
    the zorder_range contract on the locality-optimal curve — the SAME
    rectangle is answered purely from decomposed Hilbert intervals
    (each fully covered quadtree square is one contiguous d-run whose
    base is its minimum corner index; no orientation bookkeeping). The
    oracle re-runs the classic xy2d recurrence as seven chained CTE
    steps and filters by the plain rectangle."""
    from osm_export_tool_python_ray.stages.zorder import hilbert_range_query

    return hilbert_range_query(
        _read(sf_dir, "events", ["event_id"]), *_ZQ
    )


def _build_hilbert_range_sql():
    n = 128
    steps = []
    prev = "h0"
    for k, s in enumerate([64, 32, 16, 8, 4, 2, 1], start=1):
        cur = "h%d" % k
        steps.append(
            """{cur} AS (
  SELECT event_id,
         d + {ss} * xor(3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END),
                        CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END) AS d,
         CASE WHEN (y & {s}) > 0 THEN x
              WHEN (x & {s}) > 0 THEN {n1} - y
              ELSE y END AS x,
         CASE WHEN (y & {s}) > 0 THEN y
              WHEN (x & {s}) > 0 THEN {n1} - x
              ELSE x END AS y
  FROM {prev}
)""".format(cur=cur, prev=prev, s=s, ss=s * s, n1=n - 1)
        )
        prev = cur
    return """
WITH h0 AS (
  SELECT event_id,
         CAST(event_id % 100 AS BIGINT) AS x,
         CAST(floor(event_id / 7.0) AS BIGINT) % 100 AS y,
         CAST(0 AS BIGINT) AS d
  FROM events
  WHERE CAST(event_id % 100 AS BIGINT) BETWEEN {xlo} AND {xhi}
    AND CAST(floor(event_id / 7.0) AS BIGINT) % 100 BETWEEN {ylo} AND {yhi}
), {steps}
SELECT d // 64 AS qkey,
       count(*) AS n,
       CAST(sum(event_id) AS BIGINT) AS id_sum
FROM {last} GROUP BY qkey
""".format(
        steps=",\n".join(steps),
        last=prev,
        xlo=_ZQ[0],
        xhi=_ZQ[1],
        ylo=_ZQ[2],
        yhi=_ZQ[3],
    )


SQL_HILBERT_RANGE = _build_hilbert_range_sql()


DIJKSTRA_MAX_COST = 8


def q_grid_dijkstra(sf_dir):
    """Congestion-aware isochrone (stages/hotspots.py
    grid_weighted_distance): cheapest entry-cost path over
    customer-occupied res-8 cells — entering a cell costs 1, or 3 when
    ≥2 customers occupy it — from the nearest supplier seed, capped at
    total cost {c}. The weighted sibling of grid_distance: same reduced
    cell-table shape, label-correcting relaxation instead of hop BFS;
    the oracle is the same recursive min-dist CTE with the per-cell
    cost joined into the step.""".format(c=DIJKSTRA_MAX_COST)
    from osm_export_tool_python_ray.stages.hotspots import grid_weighted_distance

    def supplier_points(t: pa.Table) -> pa.Table:
        k = t.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "lon": pa.array(np.mod(k, 100.0) * 0.01 + 0.003),
                "lat": pa.array(np.mod(np.floor(k / 3.0), 100.0) * 0.01 + 0.004),
            }
        )

    return grid_weighted_distance(
        _read(sf_dir, "customer", ["c_custkey"]).map_batches(
            _customer_points, batch_format="pyarrow"
        ),
        _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
            supplier_points, batch_format="pyarrow"
        ),
        res=8,
        max_cost=DIJKSTRA_MAX_COST,
        hot_threshold=2,
    )


SQL_GRID_DIJKSTRA = """
WITH RECURSIVE occ AS (
  SELECT cell, count(*) AS n FROM (
    SELECT CAST(8 AS BIGINT) * 288230376151711744
         + CAST(floor(((c_custkey % 100) * 0.01 + 180.0) * 32768.0 / 360.0) AS BIGINT) * 536870912
         + CAST(floor(((CAST(floor(c_custkey / 7.0) AS BIGINT) % 100) * 0.01 + 90.0) * 32768.0 / 360.0) AS BIGINT) AS cell
    FROM customer
  ) GROUP BY cell
), wocc AS (
  SELECT cell, CASE WHEN n >= 2 THEN 3 ELSE 1 END AS cost FROM occ
), seedc AS (
  SELECT DISTINCT CAST(8 AS BIGINT) * 288230376151711744
       + CAST(floor(((s_suppkey % 100) * 0.01 + 0.003 + 180.0) * 32768.0 / 360.0) AS BIGINT) * 536870912
       + CAST(floor(((CAST(floor(s_suppkey / 3.0) AS BIGINT) % 100) * 0.01 + 0.004 + 90.0) * 32768.0 / 360.0) AS BIGINT) AS cell
  FROM supplier
), seeds AS (
  SELECT o.cell FROM wocc o JOIN seedc s ON s.cell = o.cell
), walk(cell, d) AS (
  SELECT cell, CAST(0 AS BIGINT) FROM seeds
  UNION
  SELECT o.cell, w.d + o.cost
  FROM walk w JOIN wocc o
    ON o.cell IN (w.cell + 1, w.cell - 1, w.cell + 536870912, w.cell - 536870912)
  WHERE w.d + o.cost <= {c}
)
SELECT cell, min(d) AS dist FROM walk GROUP BY cell
""".format(c=DIJKSTRA_MAX_COST)


def q_move_octants(sf_dir):
    """Movement-direction histogram (stages/journey.py move_octants):
    consecutive per-user trajectory segments classified into 8 integer
    direction octants (+8 = stationary) — the same grid/order contract
    as trajectory / trajectory_simplify, pure int64 sign-and-compare
    ladder mirrored clause-for-clause by the oracle's CASE."""
    from osm_export_tool_python_ray.stages.journey import move_octants

    return move_octants(_read(sf_dir, "events", ["event_id", "user_id", "ts"]))


SQL_MOVE_OCTANTS = """
WITH pts AS (
  SELECT user_id, ts, event_id,
         CAST(event_id % 100 AS BIGINT) AS x,
         CAST(floor(event_id / 7.0) AS BIGINT) % 100 AS y
  FROM events
), seg AS (
  SELECT x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT CAST(CASE
         WHEN dx = 0 AND dy = 0 THEN 8
         WHEN abs(dx) > abs(dy) AND dx > 0 THEN 0
         WHEN abs(dx) > abs(dy) AND dx < 0 THEN 4
         WHEN abs(dy) > abs(dx) AND dy > 0 THEN 2
         WHEN abs(dy) > abs(dx) AND dy < 0 THEN 6
         WHEN dx > 0 AND dy > 0 THEN 1
         WHEN dx < 0 AND dy > 0 THEN 3
         WHEN dx < 0 AND dy < 0 THEN 5
         ELSE 7
       END AS BIGINT) AS octant,
       count(*) AS n
FROM seg WHERE dx IS NOT NULL
GROUP BY octant
"""


def q_tile_counts(sf_dir):
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        _customer_points, batch_format="pyarrow"
    )

    def partial(t: pa.Table) -> pa.Table:
        x, y = lonlat_to_tile(
            t.column("lon").to_numpy(zero_copy_only=False),
            t.column("lat").to_numpy(zero_copy_only=False),
            12,
        )
        key = x * (1 << 22) + y
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "tile_x": pa.array((u // (1 << 22)).astype(np.int64)),
                "tile_y": pa.array((u % (1 << 22)).astype(np.int64)),
                "n_partial": pa.array(c.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["tile_x", "tile_y"])
        .aggregate(Sum("n_partial", alias_name="n"))
    )


SQL_TILE_COUNTS = """
WITH pts AS (
  SELECT (c_custkey % 100) * 0.01 AS lon,
         (CAST(floor(c_custkey / 7.0) AS BIGINT) % 100) * 0.01 AS lat
  FROM customer
), tiles AS (
  SELECT CAST(floor((lon + 180.0) / 360.0 * 4096) AS BIGINT) AS tile_x,
         {QF_Y} AS tile_y
  FROM pts
)
SELECT tile_x, tile_y, count(*) AS n FROM tiles GROUP BY tile_x, tile_y
""".format(
    QF_Y=sql_qfloor(
        "(1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi())"
        " / 2.0 * 4096"
    )
)


def q_knn(sf_dir):
    """Cell-local kNN over the synthetic customer points; queries are the
    5 smallest custkeys. res=0/ring=1 cells (~2.8°) cover the whole 1°×1°
    point field, so the result equals global kNN — which the SQL oracle
    computes with a window function."""
    from osm_export_tool_python_ray.stages.knn import knn_nearest_features

    pts = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        _customer_points, batch_format="pyarrow"
    )

    def as_features(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "osm_id": t.column("c_custkey"),
                "minx": t.column("lon"),
                "miny": t.column("lat"),
                "maxx": t.column("lon"),
                "maxy": t.column("lat"),
            }
        )

    def as_queries(t: pa.Table) -> pa.Table:
        tt = t.filter(pc.less_equal(t.column("c_custkey"), 5))
        return pa.table(
            {
                "query_id": tt.column("c_custkey"),
                "lon": tt.column("lon"),
                "lat": tt.column("lat"),
            }
        )

    feats = pts.map_batches(as_features, batch_format="pyarrow")
    queries = pts.map_batches(as_queries, batch_format="pyarrow")
    # dist_round=10 quantizes distances BEFORE ranking so equal-distance
    # ties break by osm_id on both sides (numpy and DuckDB doubles can
    # differ in the last ulp, which silently flips raw-distance ties)
    return knn_nearest_features(
        feats, queries, k=3, res=0, ring=1, num_buckets=8, dist_round=10
    )


SQL_KNN = """
WITH pts AS (
  SELECT c_custkey,
         (c_custkey % 100) * 0.01 AS lon,
         (CAST(floor(c_custkey / 7.0) AS BIGINT) % 100) * 0.01 AS lat
  FROM customer
), q AS (
  SELECT c_custkey AS query_id, lon AS qlon, lat AS qlat FROM pts WHERE c_custkey <= 5
), ranked AS (
  SELECT q.query_id, p.c_custkey AS osm_id,
         round((q.qlon - p.lon) * (q.qlon - p.lon) + (q.qlat - p.lat) * (q.qlat - p.lat), 10) AS dist2,
         row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round((q.qlon - p.lon) * (q.qlon - p.lon)
                            + (q.qlat - p.lat) * (q.qlat - p.lat), 10),
                      p.c_custkey
         ) - 1 AS rank
  FROM q CROSS JOIN pts p
)
SELECT query_id, osm_id, dist2, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank < 3
"""


# -------------------------------------------------------------- OSM export

def _pbf_path(n_shards=4):
    """Deterministic cached .osm.pbf of the corpus's deduped elements
    (built once: corpus parquet → explode+dedup → write_osm_pbf)."""
    os.makedirs(_CORPUS_CACHE, exist_ok=True)
    path = os.path.join(_CORPUS_CACHE, "corpus_s%d.osm.pbf" % n_shards)
    if not os.path.exists(path):
        import ray.data

        from osm_export_tool_python_ray.pipelines.export import parse_elements
        from osm_export_tool_python_ray.sources.pbf import write_osm_pbf

        etab = pa.concat_tables(
            list(
                parse_elements(
                    ray.data.read_parquet(corpus_path(n_shards))
                ).iter_batches(batch_format="pyarrow", batch_size=None)
            )
        )
        tmp = path + ".tmp"
        write_osm_pbf(tmp, etab.sort_by([("ekey", "ascending")]))
        os.replace(tmp, path)
    return path


def q_pbf_element_stats(sf_dir):
    """Native .osm.pbf codec (sources/pbf.py; the reference's only input
    format, sources.py:24-32) certified against an independent SQL
    derivation: the corpus's deduped elements round-trip engine-side
    through write_osm_pbf → read_osm_pbf (vectorized varint / zigzag /
    delta / string-table decode, parallel per-blob Dataset read), and the
    per-kind count, id sum, tag/ref/member totals and 1e-7-grid
    coordinate checksum must equal what DuckDB re-derives straight from
    the corpus JSON spans (export_oracle.sql_pbf_element_stats). One row
    per kind — any codec bit-slip moves a sum."""
    from ray.data.aggregate import Sum

    from osm_export_tool_python_ray.sources.pbf import read_osm_pbf

    ds = read_osm_pbf(_pbf_path())

    def partial(t: pa.Table) -> pa.Table:
        kinds = np.asarray(t.column("kind").to_pylist(), dtype=object)
        ids = t.column("element_id").to_numpy(zero_copy_only=False)
        ntags = np.array(
            [len(x) if x else 0 for x in t.column("tags").to_pylist()],
            dtype=np.int64,
        )
        nrefs = np.array(
            [len(x) if x else 0 for x in t.column("refs").to_pylist()],
            dtype=np.int64,
        )
        nmem = np.array(
            [len(x) if x else 0 for x in t.column("members").to_pylist()],
            dtype=np.int64,
        )
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        coord = np.zeros(len(ids), dtype=np.int64)
        isnode = kinds == "node"
        if isnode.any():
            coord[isnode] = (
                np.rint(lon[isnode] * 1e7) + np.rint(lat[isnode] * 1e7)
            ).astype(np.int64)
        uk, inv = np.unique(kinds, return_inverse=True)

        def fold(v):
            out = np.zeros(len(uk), dtype=np.int64)
            np.add.at(out, inv, v)
            return pa.array(out)

        return pa.table(
            {
                "kind": pa.array(list(uk), type=pa.string()),
                "n": fold(np.ones(len(ids), dtype=np.int64)),
                "id_sum": fold(ids),
                "tag_sum": fold(ntags),
                "ref_sum": fold(nrefs),
                "member_sum": fold(nmem),
                "coord_sum": fold(coord),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("kind")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("id_sum", alias_name="id_sum"),
            Sum("tag_sum", alias_name="tag_sum"),
            Sum("ref_sum", alias_name="ref_sum"),
            Sum("member_sum", alias_name="member_sum"),
            Sum("coord_sum", alias_name="coord_sum"),
        )
    )
    return agg.sort("kind")


def q_pbf_export_theme_counts(sf_dir):
    """The FULL flagship export run over NATIVE .osm.pbf input
    (read_osm_pbf → dedup → assembly → theme routing): per-theme counts
    must equal the SQL re-derivation from the raw corpus JSON — the
    driver-visible twin of the pytest capstone (export-over-pbf ≡
    export-over-parquet). Shares export_theme_counts' oracle: the pbf
    path feeds the identical element table, so the identical SQL is the
    proof that NOTHING was lost or altered through the binary format."""
    import ray.data

    from osm_export_tool_python_ray.pipelines.export import run_export, theme_counts
    from osm_export_tool_python_ray.sources.pbf import read_osm_pbf

    key = "pbf_export"
    if key not in _EXPORT_CACHE:
        mapping = _default_mapping()
        themed = run_export(
            None,
            mapping,
            elements_ds=read_osm_pbf(_pbf_path()),
            num_partitions=4,
            num_buckets=16,
        ).materialize()
        _EXPORT_CACHE[key] = (mapping, themed)
    _mapping, themed = _EXPORT_CACHE[key]
    return theme_counts(themed).sort(["theme", "geom_type"])


def q_export_theme_counts(sf_dir):
    """Flagship export over the deterministic interleaved corpus (the
    input_hint shape) with the reference's default.yml: per-theme counts.
    Not SQL-expressible (geometry assembly) → rows-only + pytest goldens."""
    from osm_export_tool_python_ray.pipelines.export import theme_counts

    _mapping, themed = _run_default_export()
    return theme_counts(themed).sort(["theme", "geom_type"])


def q_tile_assignment(sf_dir):
    """Raster↔vector assignment over the corpus: features × tile spans.
    Rows-only (geometry assembly upstream)."""
    import ray.data

    from osm_export_tool_python_ray.stages.explode import explode_tiles
    from osm_export_tool_python_ray.stages.tiling import assign_features_to_tiles, dedup_tiles

    _mapping, themed = _run_default_export()
    feats = themed.map_batches(
        lambda t: t.select(["osm_id", "minx", "miny", "maxx", "maxy"]),
        batch_format="pyarrow",
    )
    tiles = dedup_tiles(
        ray.data.read_parquet(corpus_path(n_shards=4)).map_batches(
            explode_tiles, batch_format="pyarrow"
        ),
        num_buckets=8,
    )
    out = assign_features_to_tiles(feats, tiles, zooms=[12], num_buckets=16)
    return out.map_batches(
        lambda t: t.select(["tile_z", "tile_x", "tile_y", "media_ref", "n_features"]),
        batch_format="pyarrow",
    ).sort(["tile_z", "tile_x", "tile_y"])


def q_tile_theme_counts(sf_dir):
    """Composed geospatial rollup: per-(tile, theme) feature-overlap
    counts at z12 — the raster↔vector assignment (J5) joined with the
    theme routing in ONE light-row exchange (the theme string rides the
    tile-expansion rows; stages/tiling.py tile_theme_counts). Oracle:
    export_oracle.sql_tile_theme_counts re-derives both sides in SQL."""
    import ray.data

    from osm_export_tool_python_ray.stages.explode import explode_tiles
    from osm_export_tool_python_ray.stages.tiling import dedup_tiles, tile_theme_counts

    _mapping, themed = _run_default_export()
    feats = themed.map_batches(
        lambda t: t.select(["osm_id", "theme", "minx", "miny", "maxx", "maxy"]),
        batch_format="pyarrow",
    )
    tiles = dedup_tiles(
        ray.data.read_parquet(corpus_path(n_shards=4)).map_batches(
            explode_tiles, batch_format="pyarrow"
        ),
        num_buckets=8,
    )
    out = tile_theme_counts(feats, tiles, zooms=[12], num_buckets=16)
    return out.sort(["tile_z", "tile_x", "tile_y", "theme"])


def q_spatial_join(sf_dir):
    """Two-layer distributed ε-proximity spatial join (PBSM shape):
    every (road, building) feature pair whose bboxes come within 0.05°
    of each other — the nearest-road-for-building / overlay prefilter
    class the reference delegates to OGR/GEOS on one machine. One
    cell-bucketed exchange, owner-cell (reference-point) pair dedup,
    counted oversize/hot-cell caps (stages/spatial_join.py). Oracle:
    export_oracle.sql_spatial_join re-derives the pair set with a plain
    SQL inequality join over the re-derived themed features."""
    from osm_export_tool_python_ray.stages.spatial_join import bbox_intersection_join

    _mapping, themed = _run_default_export()

    def side(theme_name):
        def fn(t: pa.Table) -> pa.Table:
            m = pc.equal(t.column("theme"), theme_name)
            f = t.filter(m)
            return pa.table(
                {
                    "fid": f.column("osm_id"),
                    "minx": f.column("minx"),
                    "miny": f.column("miny"),
                    "maxx": f.column("maxx"),
                    "maxy": f.column("maxy"),
                }
            )

        return themed.map_batches(fn, batch_format="pyarrow")

    out = bbox_intersection_join(
        side("roads"), side("buildings"), res=5, num_buckets=16, expand=0.05
    )
    return out.sort(["l_id", "r_id"])


def q_spatial_anti_join(sf_dir):
    """ε-proximity spatial ANTI-join (stages/spatial_join.py
    points_not_near): customer points with NO supplier point within
    sqrt(2.5e-4) ≈ 0.0158° — one cell-bucketed exchange with the small
    side replicated to its 3×3 neighborhood, so the per-cell keep/drop
    decision is complete without a second match-collection pass. The
    supplier point family is offset (+0.003, +0.004) from the customer
    grid so the squared distances never land on eps2 exactly; the
    near test (dx*dx + dy*dy < 0.00025) is mirrored verbatim in SQL."""
    from osm_export_tool_python_ray.stages.spatial_join import points_not_near

    pts = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        _customer_points, batch_format="pyarrow"
    ).map_batches(
        lambda t: pa.table(
            {"pid": t.column("c_custkey"), "lon": t.column("lon"), "lat": t.column("lat")}
        ),
        batch_format="pyarrow",
    )

    def supplier_points(t: pa.Table) -> pa.Table:
        k = t.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "pid": t.column("s_suppkey"),
                "lon": pa.array(np.mod(k, 100.0) * 0.01 + 0.003),
                "lat": pa.array(np.mod(np.floor(k / 3.0), 100.0) * 0.01 + 0.004),
            }
        )

    feats = _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        supplier_points, batch_format="pyarrow"
    )
    return points_not_near(
        pts, feats, eps2=0.00025, cell_size=0.02, num_buckets=32
    ).sort("pid")


SQL_SPATIAL_ANTI_JOIN = """
WITH cust AS (
  SELECT c_custkey AS pid,
         (c_custkey % 100) * 0.01 AS lon,
         (CAST(floor(c_custkey / 7.0) AS BIGINT) % 100) * 0.01 AS lat
  FROM customer
),
supp AS (
  SELECT (s_suppkey % 100) * 0.01 + 0.003 AS lon,
         (CAST(floor(s_suppkey / 3.0) AS BIGINT) % 100) * 0.01 + 0.004 AS lat
  FROM supplier
)
SELECT pid, lon, lat FROM cust c
WHERE NOT EXISTS (
  SELECT 1 FROM supp s
  WHERE (s.lon - c.lon) * (s.lon - c.lon)
      + (s.lat - c.lat) * (s.lat - c.lat) < 0.00025
)
ORDER BY pid
"""


def q_aoi_extract(sf_dir):
    """AOI spatial semi-join (J4 — the OsmExpress region-extract analog):
    features of the corpus restricted to a 1°×1° AOI. Rows-only."""
    from osm_export_tool_python_ray.stages.spatial_filter import aoi_semi_join

    _mapping, themed = _run_default_export()
    aoi = [[np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)])]]
    out = aoi_semi_join(themed, aoi)
    return out.map_batches(
        lambda t: t.select(["theme", "osm_id", "geom_type"]), batch_format="pyarrow"
    ).sort(["theme", "osm_id", "geom_type"])


def q_media_features(sf_dir):
    """Multimodal pipeline over REAL media payloads: one PPM image per
    document ref, generated deterministically per batch (at scale this is
    the media-store fetch stage — refs never land on the driver), decoded
    STRICTLY by the pure-numpy codec in an actor-pool map_batches. The
    payload dimensions derive from md5(media_ref), so the DuckDB oracle
    re-derives the expected header (width, height) through the same md5
    arithmetic — an exact end-to-end check of ref → seed → encode →
    decode → header parse. Codec byte-level correctness is additionally
    pytest-verified (tests/test_training_ops.py TestMedia round-trips)."""
    from osm_export_tool_python_ray.stages.media import (
        DecodeStage,
        make_real_media_table,
    )

    def refs(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        return make_real_media_table(["img:%d" % i for i in ids])

    media = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        refs, batch_format="pyarrow"
    )
    decoded = media.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"strict": True},  # every payload decodes for real
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )
    return decoded.map_batches(
        lambda t: t.select(["media_ref", "format", "width", "height"]),
        batch_format="pyarrow",
    )


# expected header dims re-derived from md5(media_ref): seed = LE uint32 of
# the first 4 md5 bytes (low half of the le64 parse); h = 16 + seed % 17,
# w = 16 + (seed >> 8) % 23 — stages/media.py make_real_media_table
SQL_MEDIA_FEATURES = """
WITH r AS (
  SELECT 'img:' || CAST(doc_id AS VARCHAR) AS media_ref FROM documents
),
s AS (
  SELECT media_ref,
         ({le}) % CAST(4294967296 AS UBIGINT) AS seed
  FROM (SELECT media_ref, md5(media_ref) AS h FROM r)
)
SELECT media_ref,
       'ppm' AS format,
       CAST(16 + (seed // 256) % 23 AS INTEGER) AS width,
       CAST(16 + seed % 17 AS INTEGER) AS height
FROM s
""".format(le=_le64_expr("h"))


def q_audio_features(sf_dir):
    """Multimodal AUDIO path over real RIFF/WAVE payloads (the image twin
    is media_features): one seed-deterministic PCM tone per document ref,
    decoded STRICTLY by the pure-numpy WAV codec in an actor-pool
    map_batches; output is the per-clip structural profile (sample rate,
    sample count, exact integer duration). The clip length derives from
    md5(media_ref) through the IDENTICAL IEEE double expression
    floor(16000·(0.01 + (seed%5)·0.01)) on both sides, so the oracle
    re-derives ref → seed → encode → decode → length end-to-end; sample
    VALUES are sine-generated (transcendental) and are pytest-verified by
    codec round-trips instead (tests/test_training_ops.py TestMedia)."""
    from osm_export_tool_python_ray.stages.media import (
        DecodeStage,
        make_real_media_table,
    )

    def refs(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        return make_real_media_table(
            ["aud:%d" % i for i in ids], media_type="audio"
        )

    media = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        refs, batch_format="pyarrow"
    )
    decoded = media.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"strict": True},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )

    def out(t: pa.Table) -> pa.Table:
        ns = t.column("n_samples").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "media_ref": t.column("media_ref"),
                "format": t.column("format"),
                "sample_rate": t.column("sample_rate"),
                "n_samples": pa.array(ns),
                "duration_us": pa.array(ns * 1_000_000 // 16000),
            }
        )

    return decoded.map_batches(out, batch_format="pyarrow")


SQL_AUDIO_FEATURES = """
WITH r AS (
  SELECT 'aud:' || CAST(doc_id AS VARCHAR) AS media_ref FROM documents
),
s AS (
  SELECT media_ref,
         ({le}) % CAST(4294967296 AS UBIGINT) AS seed
  FROM (SELECT media_ref, md5(media_ref) AS h FROM r)
),
n AS (
  SELECT media_ref,
         CAST(floor(16000 * (0.01 + CAST(seed % 5 AS DOUBLE) * 0.01)) AS BIGINT) AS n_samples
  FROM s
)
SELECT media_ref, 'wav' AS format, CAST(16000 AS INTEGER) AS sample_rate,
       n_samples, CAST(n_samples * 1000000 // 16000 AS BIGINT) AS duration_us
FROM n
""".format(le=_le64_expr("h"))


def q_ann_recall_eval(sf_dir):
    """Retrieval-quality evaluation harness (the recall@k / MRR report
    every ANN deployment runs before switching off brute force): for each
    query point, the IVF top-5 (strided centroids, nprobe probing) is
    scored against the exact brute-force top-5 — hits, recall in exact
    ppm, and the reciprocal rank of the true nearest neighbor inside the
    IVF list. Both retrieval pipelines are the engine's own distributed
    stages (stages/ann.py); the comparison itself touches only
    |queries|×k rows. Oracle: re-derives BOTH retrievals in SQL (the
    ann_topk / ivf_topk derivations inlined as subqueries) and the same
    integer metrics — so this row certifies the evaluator AND re-certifies
    both retrieval paths in one check.

    Determinism assumption (audited, not lucky): top-k SET membership
    feeds integer metrics, so a numpy-vs-DuckDB summation-order near-tie
    at the rank-4/5 boundary could flip a member. The deterministic
    corpus carries a >=1e-3 cosine gap at that boundary at both oracle
    scales — eleven orders above summation noise — proven by
    tests/test_quantize.py::test_ann_topk_boundary_margin."""
    from osm_export_tool_python_ray.stages.ann import ann_topk, ivf_topk

    K = 5
    qm, qids = _query_vectors(sf_dir, 4)
    exact = ann_topk(_read(sf_dir, "embeddings"), qm, qids, k=K).take_all()
    ivf = ivf_topk(
        _read(sf_dir, "embeddings"), qm, qids, k=K, init="strided", refine_iters=0
    ).take_all()

    ex_by_q = {}
    for r in exact:
        ex_by_q.setdefault(int(r["query_id"]), {})[int(r["vec_id"])] = int(r["rank"])
    ivf_by_q = {}
    for r in ivf:
        ivf_by_q.setdefault(int(r["query_id"]), {})[int(r["vec_id"])] = int(r["rank"])

    rows = []
    for q in sorted(ex_by_q):
        ex = ex_by_q[q]
        iv = ivf_by_q.get(q, {})
        hits = len(set(ex) & set(iv))
        top1 = min(ex, key=lambda v: ex[v])
        rr = 1_000_000 // (iv[top1] + 1) if top1 in iv else 0
        rows.append((q, hits, hits * 1_000_000 // K, rr))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "n_hits": pa.array([r[1] for r in rows], type=pa.int64()),
            "recall_ppm": pa.array([r[2] for r in rows], type=pa.int64()),
            "rr_ppm": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )


def _build_ann_recall_sql():
    exact5 = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id IN (0,1,2,3)),
ranked AS (
  SELECT q.query_id, e.vec_id,
         row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id
         ) - 1 AS rank
  FROM q CROSS JOIN embeddings e
)
SELECT query_id, vec_id, rank FROM ranked WHERE rank < 5
"""
    return """
WITH ex AS (SELECT * FROM ({exact})),
ivf AS (SELECT query_id, vec_id, rank FROM ({ivf})),
hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM ex e JOIN ivf i ON i.query_id = e.query_id AND i.vec_id = e.vec_id
  GROUP BY 1
),
top1 AS (SELECT query_id, vec_id FROM ex WHERE rank = 0),
rr AS (
  SELECT t.query_id, min(i.rank) AS r
  FROM top1 t LEFT JOIN ivf i
    ON i.query_id = t.query_id AND i.vec_id = t.vec_id
  GROUP BY 1
),
qq AS (SELECT DISTINCT query_id FROM ex)
SELECT qq.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n_hits, 0) * 1000000 // 5 AS BIGINT) AS recall_ppm,
       CAST(CASE WHEN r.r IS NULL THEN 0 ELSE 1000000 // (r.r + 1) END AS BIGINT) AS rr_ppm
FROM qq
LEFT JOIN hits h ON h.query_id = qq.query_id
LEFT JOIN rr r ON r.query_id = qq.query_id
ORDER BY qq.query_id
""".format(exact=exact5, ivf=SQL_IVF_TOPK)


SQL_ANN_RECALL_EVAL = _build_ann_recall_sql()


def q_l_diversity(sf_dir):
    """l-diversity audit (Machanavajjhala et al. 2007 — the companion to
    the engine's k_anonymity row): per source equivalence class, how many
    DISTINCT sensitive values (lang) appear; a class whose members all
    share one sensitive value leaks it even at high k. Per-batch distinct
    (source, lang) pairs → one tiny composite groupby → per-source
    distinct count; the exchange moves |sources|·|langs| aggregate rows,
    never documents."""
    from ray.data.aggregate import Count

    L = 3

    def partial(t: pa.Table) -> pa.Table:
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        lang = np.asarray(t.column("lang").to_pylist(), dtype=object)
        o = np.lexsort((lang, src))
        s, l = src[o], lang[o]
        keep = np.ones(len(o), dtype=bool)
        keep[1:] = (s[1:] != s[:-1]) | (l[1:] != l[:-1])
        return pa.table(
            {
                "source": pa.array(list(s[keep]), type=pa.string()),
                "lang": pa.array(list(l[keep]), type=pa.string()),
            }
        )

    pairs = (
        _read(sf_dir, "documents", ["source", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .count()
    )
    per_src = pairs.groupby("source").aggregate(Count(alias_name="l"))

    def flag(t: pa.Table) -> pa.Table:
        lv = t.column("l").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": t.column("source"),
                "l": pa.array(lv),
                "violates_l": pa.array(lv < L),
            }
        )

    return per_src.map_batches(flag, batch_format="pyarrow").sort("source")


SQL_L_DIVERSITY = """
SELECT source, CAST(count(DISTINCT lang) AS BIGINT) AS l,
       count(DISTINCT lang) < 3 AS violates_l
FROM documents GROUP BY source ORDER BY source
"""


def q_acf_lag1(sf_dir):
    """Lag-1 autocorrelation sufficient statistics over each user's
    hourly event-count series (the time-series diagnostic that separates
    bursty from Poisson-like activity): per user, the span in hours and
    the exact integer sums Σx, Σx², Σ x_h·x_{h+1} over consecutive
    occupied hours (missing hours are zero counts, so only adjacent
    occupied hours contribute to Σxy). Emitting the sufficient statistics
    rather than a float ρ keeps the row integer-exact (the house
    gram_matrix / spatial_autocorr convention). Two combiner-shaped
    exchanges: (user, hour) count fold via keyed_sum, then a user-keyed
    segmented consecutive-hour fold."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map, keyed_sum

    HOUR_US = 3_600_000_000

    def hour_partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        hr = ts // HOUR_US
        key = np.stack([u, hr], axis=1)
        uq, inv = np.unique(key, axis=0, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uq[:, 0]),
                "hr": pa.array(uq[:, 1]),
                "n": pa.array(n),
            }
        )

    hourly = keyed_sum(
        _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
            hour_partial, batch_format="pyarrow"
        ),
        ["user_id", "hr"],
        [("n", "n")],
    ).map_batches(
        lambda t: t.append_column(
            "bucket",
            pa.array(
                (
                    t.column("user_id").to_numpy(zero_copy_only=False) % 64
                ).astype(np.int32)
            ),
        ),
        batch_format="pyarrow",
    )

    OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_hours", pa.int64()),
            ("sx", pa.int64()),
            ("sxx", pa.int64()),
            ("sxy", pa.int64()),
        ]
    )

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        hr = g.column("hr").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((hr, u))
        u, hr, n = u[order], hr[order], n[order]
        m = len(u)
        seg = np.ones(m, dtype=bool)
        seg[1:] = u[1:] != u[:-1]
        starts = np.nonzero(seg)[0]
        sid = np.cumsum(seg) - 1
        nseg = len(starts)
        sx = np.zeros(nseg, dtype=np.int64)
        sxx = np.zeros(nseg, dtype=np.int64)
        np.add.at(sx, sid, n)
        np.add.at(sxx, sid, n * n)
        ends = np.append(starts[1:], m) - 1
        span = hr[ends] - hr[starts] + 1
        # adjacent occupied hours within a user: same segment AND hr+1
        sxy = np.zeros(nseg, dtype=np.int64)
        if m > 1:
            adj = (~seg[1:]) & (hr[1:] == hr[:-1] + 1)
            np.add.at(sxy, sid[:-1][adj], n[:-1][adj] * n[1:][adj])
        return pa.table(
            {
                "user_id": pa.array(u[seg]),
                "n_hours": pa.array(span),
                "sx": pa.array(sx),
                "sxx": pa.array(sxx),
                "sxy": pa.array(sxy),
            }
        )

    return grouped_map(
        hourly,
        "bucket",
        fold,
        num_partitions=8,
        payload_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("hr", pa.int64()),
                ("n", pa.int64()),
                ("bucket", pa.int32()),
            ]
        ),
    ).sort("user_id")


SQL_ACF_LAG1 = """
WITH h AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS hr,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT a.user_id, a.n * b.n AS xy
  FROM h a JOIN h b ON b.user_id = a.user_id AND b.hr = a.hr + 1
),
s AS (
  SELECT user_id, CAST(max(hr) - min(hr) + 1 AS BIGINT) AS n_hours,
         CAST(sum(n) AS BIGINT) AS sx, CAST(sum(n * n) AS BIGINT) AS sxx
  FROM h GROUP BY 1
),
x AS (
  SELECT user_id, CAST(sum(xy) AS BIGINT) AS sxy FROM p GROUP BY 1
)
SELECT s.user_id, s.n_hours, s.sx, s.sxx,
       CAST(coalesce(x.sxy, 0) AS BIGINT) AS sxy
FROM s LEFT JOIN x ON x.user_id = s.user_id
ORDER BY s.user_id
"""


def q_minhash_eval(sf_dir):
    """Sketch-quality evaluation for the MinHash estimator (the dedup
    twin of ann_recall_eval): for every pair the LSH pipeline reports,
    the signature-estimated similarity vs the EXACT Jaccard of the two
    documents' distinct 5-byte shingle-window sets, both in integer ppm,
    plus the absolute estimator error — the report that calibrates an
    LSH threshold before a corpus-wide dedup run. Scale shape: the pair
    list is LSH-bounded; each doc's distinct window-hash set ships as a
    list<uint64> payload through two bucket_joins (sets ride the rows —
    no broadcast of the corpus); the per-pair sorted-array intersection
    is numpy per candidate. Oracle: re-derives the pairs (the full
    signature pipeline), the exact per-doc window sets AND the ppm
    arithmetic in SQL — one row certifies estimator, sets and evaluator
    together."""
    from osm_export_tool_python_ray.functions.text import shingle_windows_batch
    from osm_export_tool_python_ray.stages.dedup import minhash_lsh_pairs
    from osm_export_tool_python_ray.stages.joins import bucket_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, threshold=0.5, num_buckets=16)

    def sets(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        x, offs = shingle_windows_batch(t.column("text").to_pylist())
        arrs = [
            np.unique(x[offs[i] : offs[i + 1]]) for i in range(len(ids))
        ]
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        keep = lens > 0  # empty shingle sets have no defined Jaccard
        arrs = [a for a, k_ in zip(arrs, keep) if k_]
        flat = (
            np.concatenate(arrs) if arrs else np.array([], dtype=np.uint64)
        )
        la = pa.ListArray.from_arrays(
            pa.array(
                np.concatenate([[0], np.cumsum(lens[keep])]).astype(np.int32)
            ),
            pa.array(flat, type=pa.uint64()),
        )
        return pa.table({"doc_id": pa.array(ids[keep]), "sh": la})

    shs = docs.map_batches(sets, batch_format="pyarrow")

    def pair_prep(t: pa.Table) -> pa.Table:
        sim = t.column("similarity").to_numpy(zero_copy_only=False)
        nm = np.round(sim * 64.0).astype(np.int64)  # n/64 floats are exact
        return pa.table(
            {
                "doc_id": t.column("doc_a"),
                "doc_b": t.column("doc_b"),
                "nm": pa.array(nm),
            }
        )

    sh_schema = pa.schema([("doc_id", pa.int64()), ("sh", pa.list_(pa.uint64()))])
    p1 = bucket_join(
        pairs.map_batches(pair_prep, batch_format="pyarrow"),
        shs,
        "doc_id",
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("doc_b", pa.int64()), ("nm", pa.int64())]
        ),
        right_schema=sh_schema,
    )

    def flip(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_a": t.column("doc_id"),
                "doc_id": t.column("doc_b"),
                "nm": t.column("nm"),
                "sh_a": t.column("sh"),
            }
        )

    p2 = bucket_join(
        p1.map_batches(flip, batch_format="pyarrow"),
        shs.map_batches(
            lambda t: pa.table({"doc_id": t.column("doc_id"), "sh_b": t.column("sh")}),
            batch_format="pyarrow",
        ),
        "doc_id",
        left_schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("doc_a", pa.int64()),
                ("nm", pa.int64()),
                ("sh_a", pa.list_(pa.uint64())),
            ]
        ),
        right_schema=pa.schema([("doc_id", pa.int64()), ("sh_b", pa.list_(pa.uint64()))]),
    )

    def score(t: pa.Table) -> pa.Table:
        da = t.column("doc_a").to_numpy(zero_copy_only=False)
        db = t.column("doc_id").to_numpy(zero_copy_only=False)
        nm = t.column("nm").to_numpy(zero_copy_only=False)
        sa = t.column("sh_a").to_pylist()
        sb = t.column("sh_b").to_pylist()
        est = nm * 1_000_000 // 64
        ex = np.zeros(len(da), dtype=np.int64)
        for i in range(len(da)):
            a = np.asarray(sa[i], dtype=np.uint64)
            b = np.asarray(sb[i], dtype=np.uint64)
            ni = len(np.intersect1d(a, b, assume_unique=True))
            ex[i] = ni * 1_000_000 // (len(a) + len(b) - ni)
        return pa.table(
            {
                "doc_a": pa.array(da),
                "doc_b": pa.array(db),
                "est_ppm": pa.array(est),
                "exact_ppm": pa.array(ex),
                "err_ppm": pa.array(np.abs(est - ex)),
            }
        )

    return p2.map_batches(score, batch_format="pyarrow").sort(["doc_a", "doc_b"])


def _build_minhash_eval_sql():
    return (
        "WITH "
        + _build_minhash_pair_ctes()
        + r""",
pairs AS (
  SELECT doc_a, doc_b, ({nm}) AS nm FROM mh_cand WHERE ({nm}) / 64.0 >= 0.5
),
szs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM shh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS ni
  FROM pairs p
  JOIN shh a ON a.doc_id = p.doc_a
  JOIN shh b ON b.doc_id = p.doc_b AND b.hv = a.hv
  GROUP BY 1, 2
),
ev AS (
  SELECT p.doc_a, p.doc_b,
         CAST(p.nm * 1000000 // 64 AS BIGINT) AS est_ppm,
         CAST(coalesce(i.ni, 0) * 1000000
              // (sa.sz + sb.sz - coalesce(i.ni, 0)) AS BIGINT) AS exact_ppm
  FROM pairs p
  JOIN szs sa ON sa.doc_id = p.doc_a
  JOIN szs sb ON sb.doc_id = p.doc_b
  LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
)
SELECT doc_a, doc_b, est_ppm, exact_ppm,
       CAST(abs(est_ppm - exact_ppm) AS BIGINT) AS err_ppm
FROM ev ORDER BY doc_a, doc_b
""".format(nm=_MH_MATCHES)
    )


SQL_MINHASH_EVAL = _build_minhash_eval_sql()


def q_link_scores(sf_dir):
    """Link-prediction features per edge of the co-location graph
    (common-neighbors and neighborhood Jaccard — the Liben-Nowell &
    Kleinberg 2003 baselines): for every encounter edge (a, b), the
    number of shared neighbors, both degrees, and
    |N(a)∩N(b)| / |N(a)∪N(b)| in exact ppm. Unlike the triangle counter
    (which enumerates each wedge once from its smallest node), common
    neighbors need ALL wedges, so the full both-direction adjacency goes
    through one center-keyed exchange with the same capped vectorized
    pair expansion (cap counted via report_cap); per-(v,w) counts fold
    through keyed_sum, rejoin the edge set via a tagged-union keyed
    exchange, and degrees attach through two int64 bucket_joins. No
    broadcast of the graph, no driver state."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map, keyed_sum
    from osm_export_tool_python_ray.stages.joins import bucket_join
    from osm_export_tool_python_ray.stages.journey import encounters
    from osm_export_tool_python_ray.state.metrics import report_cap

    MIN_SHARED = 2
    CAP = 512
    NB = 32

    def efilter(t: pa.Table) -> pa.Table:
        ns = t.column("n_shared").to_numpy(zero_copy_only=False)
        keep = ns >= MIN_SHARED
        return pa.table(
            {
                "a": pa.array(t.column("user_a").to_numpy(zero_copy_only=False)[keep]),
                "b": pa.array(t.column("user_b").to_numpy(zero_copy_only=False)[keep]),
            }
        )

    edges = (
        encounters(_read(sf_dir, "events", ["event_id", "user_id", "ts"]))
        .map_batches(efilter, batch_format="pyarrow")
        .materialize()  # feeds adjacency, degrees AND the final rejoin
    )

    def adj_rows(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        c = np.concatenate([a, b])
        nb = np.concatenate([b, a])
        return pa.table(
            {
                "c": pa.array(c),
                "nb": pa.array(nb),
                "bucket": pa.array((c % NB).astype(np.int32)),
            }
        )

    adjacency = edges.map_batches(adj_rows, batch_format="pyarrow")

    deg = keyed_sum(
        adjacency.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("c"),
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["node"],
        [("one", "deg")],
    )

    WEDGE = pa.schema([("v", pa.int64()), ("w", pa.int64()), ("nw", pa.int64())])

    def wedge_counts(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return WEDGE.empty_table()
        c = g.column("c").to_numpy(zero_copy_only=False)
        nb = g.column("nb").to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, c))
        c, nb = c[order], nb[order]
        starts = np.nonzero(np.concatenate([[True], c[1:] != c[:-1]]))[0]
        sizes = np.diff(np.append(starts, len(c)))
        if (sizes > CAP).any():
            rank = np.arange(len(c)) - np.repeat(starts, sizes)
            keep = rank < CAP
            report_cap("link_wedge_truncated", int((~keep).sum()))
            c, nb = c[keep], nb[keep]
            starts = np.nonzero(np.concatenate([[True], c[1:] != c[:-1]]))[0]
            sizes = np.diff(np.append(starts, len(c)))
        rank = np.arange(len(c)) - np.repeat(starts, sizes)
        left_counts = np.repeat(sizes, sizes) - 1 - rank
        total = int(left_counts.sum())
        if total == 0:
            return WEDGE.empty_table()
        L = np.repeat(np.arange(len(c)), left_counts)
        offs = np.concatenate([[np.int64(0)], np.cumsum(left_counts)])[:-1]
        R = np.arange(total) - np.repeat(offs, left_counts) + L + 1
        v, w = nb[L], nb[R]  # nb sorted within center => v < w
        key = np.stack([v, w], axis=1)
        uq, inv = np.unique(key, axis=0, return_inverse=True)
        nw = np.bincount(inv).astype(np.int64)
        return pa.table(
            {"v": pa.array(uq[:, 0]), "w": pa.array(uq[:, 1]), "nw": pa.array(nw)}
        )

    wedge_partials = grouped_map(
        adjacency,
        "bucket",
        wedge_counts,
        num_partitions=8,
        payload_schema=pa.schema(
            [("c", pa.int64()), ("nb", pa.int64()), ("bucket", pa.int32())]
        ),
    )
    nc = keyed_sum(wedge_partials, ["v", "w"], [("nw", "n_common")])

    # tagged-union rejoin: edge rows (tag 0) + common-count rows (tag 1)
    # co-located by a (v, w) bucket; a group emits iff it has an edge row
    def tag_edges(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "v": pa.array(a),
                "w": pa.array(b),
                "nw": pa.array(np.zeros(len(a), dtype=np.int64)),
                "tag": pa.array(np.zeros(len(a), dtype=np.int8)),
                "bucket": pa.array(
                    ((a * np.int64(1_000_003) + b) % NB).astype(np.int32)
                ),
            }
        )

    def tag_counts(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "v": pa.array(v),
                "w": pa.array(w),
                "nw": t.column("n_common"),
                "tag": pa.array(np.ones(len(v), dtype=np.int8)),
                "bucket": pa.array(
                    ((v * np.int64(1_000_003) + w) % NB).astype(np.int32)
                ),
            }
        )

    from osm_export_tool_python_ray.stages.exchange import union_all

    tagged = union_all(
        edges.map_batches(tag_edges, batch_format="pyarrow"),
        nc.map_batches(tag_counts, batch_format="pyarrow"),
    )

    EDGE_NC = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("n_common", pa.int64())]
    )

    def closure(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return EDGE_NC.empty_table()
        v = g.column("v").to_numpy(zero_copy_only=False)
        w = g.column("w").to_numpy(zero_copy_only=False)
        nw = g.column("nw").to_numpy(zero_copy_only=False)
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        order = np.lexsort((tag, w, v))
        v, w, nw, tag = v[order], w[order], nw[order], tag[order]
        seg = np.ones(len(v), dtype=bool)
        seg[1:] = (v[1:] != v[:-1]) | (w[1:] != w[:-1])
        sid = np.cumsum(seg) - 1
        nseg = int(seg.sum())
        has_edge = np.zeros(nseg, dtype=bool)
        np.logical_or.at(has_edge, sid, tag == 0)
        tot = np.zeros(nseg, dtype=np.int64)
        np.add.at(tot, sid, nw)
        m = has_edge
        return pa.table(
            {
                "a": pa.array(v[seg][m]),
                "b": pa.array(w[seg][m]),
                "n_common": pa.array(tot[m]),
            }
        )

    edge_nc = grouped_map(
        tagged,
        "bucket",
        closure,
        num_partitions=8,
        payload_schema=pa.schema(
            [
                ("v", pa.int64()),
                ("w", pa.int64()),
                ("nw", pa.int64()),
                ("tag", pa.int8()),
                ("bucket", pa.int32()),
            ]
        ),
    )

    deg_a = deg.map_batches(
        lambda t: pa.table({"a": t.column("node"), "deg_a": t.column("deg")}),
        batch_format="pyarrow",
    )
    deg_b = deg.map_batches(
        lambda t: pa.table({"b": t.column("node"), "deg_b": t.column("deg")}),
        batch_format="pyarrow",
    )
    j1 = bucket_join(
        edge_nc,
        deg_a,
        "a",
        left_schema=EDGE_NC,
        right_schema=pa.schema([("a", pa.int64()), ("deg_a", pa.int64())]),
    )
    j2 = bucket_join(
        j1,
        deg_b,
        "b",
        left_schema=pa.schema(
            [
                ("a", pa.int64()),
                ("b", pa.int64()),
                ("n_common", pa.int64()),
                ("deg_a", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("b", pa.int64()), ("deg_b", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        ncm = t.column("n_common").to_numpy(zero_copy_only=False)
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        db = t.column("deg_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_a": t.column("a"),
                "user_b": t.column("b"),
                "n_common": pa.array(ncm),
                "deg_a": pa.array(da),
                "deg_b": pa.array(db),
                "jaccard_ppm": pa.array(ncm * 1_000_000 // (da + db - ncm)),
            }
        )

    return j2.map_batches(finish, batch_format="pyarrow").sort(
        ["user_a", "user_b"]
    )


def q_theme_polygon_area(sf_dir):
    """Geometry-CONTENT oracle over the export surface: per theme, the
    number of way-polygons and the exact integer shoelace area sum of
    their assembled rings (coords quantized to 1e-7 deg; area in
    2·area·1e14 units). Every other export oracle checks counts/bboxes —
    this one certifies the assembled ring COORDINATES end-to-end
    (explode → node-location join → ring assembly → WKB encode →
    decode), because the integer shoelace is translation-invariant
    (the centering term telescopes to exactly zero over a closed cycle)
    and cyclic-rotation/reversal-invariant under abs() — so it is
    immune to where the stitcher started the ring, yet ANY moved vertex
    changes it. Oracle: re-walks refs→lon/lat in SQL and computes the
    identical integer cross-product sum."""
    from osm_export_tool_python_ray.functions import wkb as wkbmod

    _mapping, themed = _run_default_export()

    def partial(t: pa.Table) -> pa.Table:
        gt = t.column("geom_type").to_numpy(zero_copy_only=False)
        osm = t.column("osm_id").to_numpy(zero_copy_only=False)
        keep = (gt == 3) & (osm > 0)  # way polygons only
        idx = np.nonzero(keep)[0]
        themes, a2s = [], []
        th = t.column("theme")
        wk = t.column("wkb")
        for i in idx:
            code, rings = wkbmod.decode(wk[i].as_py())
            ring = rings[0] if code == wkbmod.POLYGON else rings[0][0]
            x = np.floor(ring[:, 0] * 1e7 + 0.5).astype(np.int64)
            y = np.floor(ring[:, 1] * 1e7 + 0.5).astype(np.int64)
            if x[0] != x[-1] or y[0] != y[-1]:
                x = np.append(x, x[0])
                y = np.append(y, y[0])
            x = x - x[0]
            y = y - y[0]
            a2 = abs(int(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])))
            themes.append(th[i].as_py())
            a2s.append(a2)
        return pa.table(
            {
                "theme": pa.array(themes, type=pa.string()),
                "a2": pa.array(np.asarray(a2s, dtype=np.int64)),
                "one": pa.array(np.ones(len(a2s), dtype=np.int64)),
            }
        )

    rows = (
        themed.map_batches(partial, batch_format="pyarrow")
        .groupby("theme")
        .sum(["a2", "one"])
        .take_all()
    )  # ≤ |themes| rows
    out = sorted((r["theme"], int(r["sum(one)"]), int(r["sum(a2)"])) for r in rows)
    return pa.table(
        {
            "theme": pa.array([r[0] for r in out], type=pa.string()),
            "n_polys": pa.array([r[1] for r in out], type=pa.int64()),
            "area2_sum": pa.array([r[2] for r in out], type=pa.int64()),
        }
    )


def q_theme_line_length(sf_dir):
    """Geometry-content oracle for the LINE branch (the polygon twin is
    theme_polygon_area): per theme, way-linestring count and the exact
    integer L1 length sum Σ(|Δlon|+|Δlat|) in 1e-7 deg units — sqrt-free
    so it is integer-exact, and reversal-invariant (|Δ| symmetric) while
    ANY moved/missing vertex changes it. Certifies the assembled
    linestring coordinates end-to-end through explode → location join →
    WKB encode → decode; SQL re-walks refs→lon/lat."""
    from osm_export_tool_python_ray.functions import wkb as wkbmod

    _mapping, themed = _run_default_export()

    def partial(t: pa.Table) -> pa.Table:
        gt = t.column("geom_type").to_numpy(zero_copy_only=False)
        keep = gt == 2
        idx = np.nonzero(keep)[0]
        themes, lens_ = [], []
        th = t.column("theme")
        wk = t.column("wkb")
        for i in idx:
            code, geom = wkbmod.decode(wk[i].as_py())
            lines = [geom] if code == wkbmod.LINESTRING else geom
            tot = 0
            for arr in lines:
                x = np.floor(arr[:, 0] * 1e7 + 0.5).astype(np.int64)
                y = np.floor(arr[:, 1] * 1e7 + 0.5).astype(np.int64)
                tot += int(
                    np.sum(np.abs(np.diff(x)) + np.abs(np.diff(y)))
                )
            themes.append(th[i].as_py())
            lens_.append(tot)
        return pa.table(
            {
                "theme": pa.array(themes, type=pa.string()),
                "l1": pa.array(np.asarray(lens_, dtype=np.int64)),
                "one": pa.array(np.ones(len(lens_), dtype=np.int64)),
            }
        )

    rows = (
        themed.map_batches(partial, batch_format="pyarrow")
        .groupby("theme")
        .sum(["l1", "one"])
        .take_all()
    )
    out = sorted((r["theme"], int(r["sum(one)"]), int(r["sum(l1)"])) for r in rows)
    return pa.table(
        {
            "theme": pa.array([r[0] for r in out], type=pa.string()),
            "n_lines": pa.array([r[1] for r in out], type=pa.int64()),
            "l1_len_sum": pa.array([r[2] for r in out], type=pa.int64()),
        }
    )


def _build_theme_line_length_sql():
    from osm_export_tool_python_ray.mapping import Mapping
    from osm_export_tool_python_ray.pipelines.export_oracle import (
        _base_ctes,
        matcher_sql,
        polygonish_sql,
    )

    path = corpus_path(n_shards=4)
    with open(
        os.path.join(os.path.dirname(__file__), "..", "mappings", "default.yml")
    ) as f:
        mapping = Mapping(f.read())
    poly = polygonish_sql()
    branches = []
    for t in mapping.themes:
        if not t.lines:
            continue
        m = matcher_sql(t.matcher.expr)
        branches.append(
            "SELECT '%s' AS theme, id, CAST(json_extract(txt, '$.refs') AS BIGINT[]) AS refs "
            "FROM wstat WHERE tagged AND complete AND n_pts >= 2 "
            "AND NOT (closed AND %s) AND %s"
            % (t.name.replace("'", "''"), poly, m)
        )
    return """
WITH {base},
wline AS (
{branches}
),
segs AS (
  SELECT theme, id, refs[i+1] AS r1, refs[i+2] AS r2
  FROM wline, UNNEST(range(0, len(refs) - 1)) r(i)
),
segc AS (
  SELECT s.theme, s.id,
         abs(CAST(floor(n2.lon * 10000000 + 0.5) AS BIGINT)
             - CAST(floor(n1.lon * 10000000 + 0.5) AS BIGINT))
         + abs(CAST(floor(n2.lat * 10000000 + 0.5) AS BIGINT)
               - CAST(floor(n1.lat * 10000000 + 0.5) AS BIGINT)) AS d
  FROM segs s
  JOIN nodes n1 ON n1.id = s.r1
  JOIN nodes n2 ON n2.id = s.r2
),
ln AS (SELECT theme, id, CAST(sum(d) AS BIGINT) AS l1 FROM segc GROUP BY theme, id)
SELECT theme, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(l1) AS BIGINT) AS l1_len_sum
FROM ln GROUP BY theme ORDER BY theme
""".format(base=_base_ctes(path), branches="\nUNION ALL\n".join(branches))


def q_trending(sf_dir):
    """Trending report (the dashboard staple): per hour, the top-3 event
    types by count with their rank and the rank they held in the
    PREVIOUS hour's top-3 (−1 if they were not trending then). Ranks
    break ties (n desc, event_type asc) identically on both sides. Scale
    shape: (hour, type) counts come from a per-batch combiner +
    keyed_sum; ranking needs one hour-keyed exchange (all of an hour's
    types co-located); the rank-delta join is the house epoch-replication
    trick — each top-3 row is re-emitted tagged for hour h+1, so the
    comparison is a second keyed exchange, never a driver-side join."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map, keyed_sum, union_all

    TOP = 3
    HOUR_US = 3_600_000_000

    types = sorted(
        r["event_type"]
        for r in _read(sf_dir, "events", ["event_type"])
        .groupby("event_type")
        .count()
        .take_all()
    )
    tix = {t_: i for i, t_ in enumerate(types)}
    tnames = np.asarray(types, dtype=object)

    def hour_partial(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        hr = ts // HOUR_US
        tid = np.array(
            [tix[x] for x in t.column("event_type").to_pylist()], dtype=np.int64
        )
        key = np.stack([hr, tid], axis=1)
        uq, inv = np.unique(key, axis=0, return_inverse=True)
        return pa.table(
            {
                "hr": pa.array(uq[:, 0]),
                "tid": pa.array(uq[:, 1]),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    counts = keyed_sum(
        _read(sf_dir, "events", ["ts", "event_type"]).map_batches(
            hour_partial, batch_format="pyarrow"
        ),
        ["hr", "tid"],
        [("n", "n")],
    ).map_batches(
        lambda t: t.append_column(
            "bucket",
            pa.array(
                (t.column("hr").to_numpy(zero_copy_only=False) % 32).astype(
                    np.int32
                )
            ),
        ),
        batch_format="pyarrow",
    )

    RANKED = pa.schema(
        [
            ("hr", pa.int64()),
            ("tid", pa.int64()),
            ("n", pa.int64()),
            ("rank", pa.int64()),
        ]
    )

    def rank_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return RANKED.empty_table()
        hr = g.column("hr").to_numpy(zero_copy_only=False)
        tid = g.column("tid").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((tid, -n, hr))
        hr, tid, n = hr[order], tid[order], n[order]
        seg = np.ones(len(hr), dtype=bool)
        seg[1:] = hr[1:] != hr[:-1]
        idx = np.arange(len(hr), dtype=np.int64)
        start = np.maximum.accumulate(np.where(seg, idx, 0))
        rank = idx - start
        m = rank < TOP
        return pa.table(
            {
                "hr": pa.array(hr[m]),
                "tid": pa.array(tid[m]),
                "n": pa.array(n[m]),
                "rank": pa.array(rank[m]),
            }
        )

    ranked = grouped_map(
        counts,
        "bucket",
        rank_fold,
        num_partitions=8,
        payload_schema=pa.schema(
            [
                ("hr", pa.int64()),
                ("tid", pa.int64()),
                ("n", pa.int64()),
                ("bucket", pa.int32()),
            ]
        ),
    ).materialize()  # feeds both sides of the delta exchange

    def tag(shift, tagval):
        def fn(t: pa.Table) -> pa.Table:
            hr = t.column("hr").to_numpy(zero_copy_only=False) + shift
            return pa.table(
                {
                    "thr": pa.array(hr),
                    "tid": t.column("tid"),
                    "n": t.column("n"),
                    "rank": t.column("rank"),
                    "tag": pa.array(
                        np.full(t.num_rows, tagval, dtype=np.int8)
                    ),
                    "bucket": pa.array((hr % 32).astype(np.int32)),
                }
            )

        return fn

    tagged = union_all(
        ranked.map_batches(tag(0, 0), batch_format="pyarrow"),
        ranked.map_batches(tag(1, 1), batch_format="pyarrow"),
    )

    OUT = pa.schema(
        [
            ("hr", pa.int64()),
            ("tid", pa.int64()),
            ("n", pa.int64()),
            ("rank", pa.int64()),
            ("prev_rank", pa.int64()),
        ]
    )

    def delta_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return OUT.empty_table()
        thr = g.column("thr").to_numpy(zero_copy_only=False)
        tid = g.column("tid").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        rk = g.column("rank").to_numpy(zero_copy_only=False)
        tg = g.column("tag").to_numpy(zero_copy_only=False)
        cur = tg == 0
        # previous-hour lookup table: (thr, tid) -> prev rank
        prev = {}
        pi = np.nonzero(~cur)[0]
        for i in pi:
            prev[(int(thr[i]), int(tid[i]))] = int(rk[i])
        ci = np.nonzero(cur)[0]
        pr = np.array(
            [prev.get((int(thr[i]), int(tid[i])), -1) for i in ci],
            dtype=np.int64,
        )
        return pa.table(
            {
                "hr": pa.array(thr[ci]),
                "tid": pa.array(tid[ci]),
                "n": pa.array(n[ci]),
                "rank": pa.array(rk[ci]),
                "prev_rank": pa.array(pr),
            }
        )

    out = grouped_map(
        tagged,
        "bucket",
        delta_fold,
        num_partitions=8,
        payload_schema=pa.schema(
            [
                ("thr", pa.int64()),
                ("tid", pa.int64()),
                ("n", pa.int64()),
                ("rank", pa.int64()),
                ("tag", pa.int8()),
                ("bucket", pa.int32()),
            ]
        ),
    )

    def names(t: pa.Table) -> pa.Table:
        tid = t.column("tid").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "hr": t.column("hr"),
                "event_type": pa.array(list(tnames[tid]), type=pa.string()),
                "n": t.column("n"),
                "rank": t.column("rank"),
                "prev_rank": t.column("prev_rank"),
            }
        )

    return out.map_batches(names, batch_format="pyarrow").sort(["hr", "rank"])


SQL_TRENDING = """
WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hr, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT hr, event_type, n,
         CAST(row_number() OVER (
           PARTITION BY hr ORDER BY n DESC, event_type
         ) - 1 AS BIGINT) AS rank
  FROM h
),
t AS (SELECT * FROM r WHERE rank < 3)
SELECT a.hr, a.event_type, a.n, a.rank,
       CAST(coalesce(b.rank, -1) AS BIGINT) AS prev_rank
FROM t a LEFT JOIN t b ON b.hr = a.hr - 1 AND b.event_type = a.event_type
ORDER BY a.hr, a.rank
"""


def q_order_recon(sf_dir):
    """Double-entry reconciliation audit (the warehouse invoice check):
    every order's header total vs the sum of its lineitems' gross
    extended prices, both quantized to exact integer 1e-4 units. Output
    is the top 20 largest absolute discrepancies (order, header, items,
    n_items, diff) — tie-broken on orderkey — the report an ETL
    validates after every load. One lineitem combiner + keyed_sum, one
    bucketed header join, one distributed sort+limit; headers with ZERO
    lineitems surface too (left join, items sum 0)."""
    from osm_export_tool_python_ray.stages.exchange import keyed_sum
    from osm_export_tool_python_ray.stages.joins import bucket_join

    def li_partial(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        rev = np.floor(ep * 10000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "orderkey": pa.array(ok),
                "rev": pa.array(rev),
                "one": pa.array(np.ones(len(ok), dtype=np.int64)),
            }
        )

    items = keyed_sum(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"]).map_batches(
            li_partial, batch_format="pyarrow"
        ),
        ["orderkey"],
        [("rev", "items_e4"), ("one", "n_items")],
    )

    def ord_prep(t: pa.Table) -> pa.Table:
        tot = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "orderkey": t.column("o_orderkey"),
                "header_e4": pa.array(
                    np.floor(tot * 10000.0 + 0.5).astype(np.int64)
                ),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        ord_prep, batch_format="pyarrow"
    )
    joined = bucket_join(
        orders,
        items,
        "orderkey",
        how="left",
        left_schema=pa.schema([("orderkey", pa.int64()), ("header_e4", pa.int64())]),
        right_schema=pa.schema(
            [
                ("orderkey", pa.int64()),
                ("items_e4", pa.int64()),
                ("n_items", pa.int64()),
            ]
        ),
    )

    def diff(t: pa.Table) -> pa.Table:
        hd = t.column("header_e4").to_numpy(zero_copy_only=False)
        # left join: zero-lineitem orders carry null item payload
        it = (
            pc.fill_null(t.column("items_e4"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ni = (
            pc.fill_null(t.column("n_items"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "orderkey": t.column("orderkey"),
                "header_e4": pa.array(hd),
                "items_e4": pa.array(it),
                "n_items": pa.array(ni),
                "abs_diff_e4": pa.array(np.abs(hd - it)),
            }
        )

    return (
        joined.map_batches(diff, batch_format="pyarrow")
        .sort(["abs_diff_e4", "orderkey"], descending=[True, False])
        .limit(20)
    )


SQL_ORDER_RECON = """
WITH li AS (
  SELECT l_orderkey AS orderkey,
         CAST(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS items_e4,
         CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem GROUP BY 1
),
o AS (
  SELECT o_orderkey AS orderkey,
         CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT) AS header_e4
  FROM orders
),
j AS (
  SELECT o.orderkey, o.header_e4,
         CAST(coalesce(li.items_e4, 0) AS BIGINT) AS items_e4,
         CAST(coalesce(li.n_items, 0) AS BIGINT) AS n_items,
         CAST(abs(o.header_e4 - coalesce(li.items_e4, 0)) AS BIGINT) AS abs_diff_e4
  FROM o LEFT JOIN li ON li.orderkey = o.orderkey
)
SELECT * FROM j ORDER BY abs_diff_e4 DESC, orderkey LIMIT 20
"""


def q_conversion_latency(sf_dir):
    """Time-to-convert report (the product-analytics survival primitive):
    per user, the timestamp of their first 'view', first 'purchase', and
    the conversion latency in exact integer µs — −1 when the user never
    viewed, never purchased, or purchased before ever viewing (not a
    view-driven conversion). Map-side per-user min partials (sentinel
    int64-max for absent) → one tiny user groupby — the exchange moves
    two int64s per user, never events."""

    SENT = np.int64(1) << np.int64(62)

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        uu, inv = np.unique(u, return_inverse=True)
        tv = np.full(len(uu), SENT, dtype=np.int64)
        tb = np.full(len(uu), SENT, dtype=np.int64)
        vm = et == "view"
        bm = et == "purchase"
        np.minimum.at(tv, inv[vm], ts[vm])
        np.minimum.at(tb, inv[bm], ts[bm])
        return pa.table(
            {"user_id": pa.array(uu), "tv": pa.array(tv), "tb": pa.array(tb)}
        )

    agg = (
        _read(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .min(["tv", "tb"])
    )

    def finish(t: pa.Table) -> pa.Table:
        tv = t.column("min(tv)").to_numpy(zero_copy_only=False)
        tb = t.column("min(tb)").to_numpy(zero_copy_only=False)
        no_v = tv >= SENT
        no_b = tb >= SENT
        conv = np.where(no_v | no_b | (tb < tv), -1, tb - tv)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "first_view_us": pa.array(np.where(no_v, -1, tv)),
                "first_buy_us": pa.array(np.where(no_b, -1, tb)),
                "convert_us": pa.array(conv),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("user_id")


SQL_CONVERSION_LATENCY = """
WITH v AS (
  SELECT user_id, min(epoch_us(ts)) AS tv FROM events
  WHERE event_type = 'view' GROUP BY 1
),
b AS (
  SELECT user_id, min(epoch_us(ts)) AS tb FROM events
  WHERE event_type = 'purchase' GROUP BY 1
),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       CAST(coalesce(v.tv, -1) AS BIGINT) AS first_view_us,
       CAST(coalesce(b.tb, -1) AS BIGINT) AS first_buy_us,
       CAST(CASE WHEN v.tv IS NULL OR b.tb IS NULL OR b.tb < v.tv
                 THEN -1 ELSE b.tb - v.tv END AS BIGINT) AS convert_us
FROM u LEFT JOIN v ON v.user_id = u.user_id
LEFT JOIN b ON b.user_id = u.user_id
ORDER BY u.user_id
"""


def q_bounce_rate(sf_dir):
    """Session bounce rate (the engagement KPI on top of the
    sessionizer): per user, the session count, single-event ("bounce")
    session count, and bounce share in exact ppm — same 30-minute-gap
    session semantics as events_sessions, aggregated one level higher.
    ONE user-keyed exchange; the fold is the vectorized boundary scan
    (sorted (user, ts) → gap/new-user breaks → reduceat session sizes →
    per-user bincounts) — integer-exact, no float."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map

    GAP_US = 30 * 60 * 1_000_000

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def bucketer(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((u % 32).astype(np.int32)))

    OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_sessions", pa.int64()),
            ("n_bounce", pa.int64()),
            ("bounce_ppm", pa.int64()),
        ]
    )

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            g.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        n = len(u)
        brk = np.ones(n, dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | ((ts[1:] - ts[:-1]) > GAP_US)
        starts = np.nonzero(brk)[0]
        sizes = np.diff(np.append(starts, n))
        su = u[starts]  # session → user
        uu, inv = np.unique(su, return_inverse=True)
        nsess = np.bincount(inv).astype(np.int64)
        nbounce = np.bincount(inv, weights=(sizes == 1)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uu),
                "n_sessions": pa.array(nsess),
                "n_bounce": pa.array(nbounce),
                "bounce_ppm": pa.array(nbounce * 1_000_000 // nsess),
            }
        )

    return grouped_map(
        ds.map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        fold,
        num_partitions=8,
    ).sort("user_id")


SQL_BOUNCE_RATE = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
), per_sess AS (
  SELECT user_id, sid, count(*) AS ne FROM numbered GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
       CAST(sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS bounce_ppm
FROM per_sess GROUP BY user_id ORDER BY user_id
"""


def q_drift_chi2(sf_dir):
    """Distribution-drift detector (the ML-ops data-drift audit): the
    event-type mix of the EARLY half of the time range vs the LATE half,
    scored per type by the chi-square contribution of its 2×2
    (type vs half) table — the report that gates a model retrain. The
    midpoint is the integer mean of observed min/max timestamps (exact
    int64 arithmetic, identical both sides). Per-batch (type, half)
    count combiner → one tiny groupby; the chi-square is the identical
    IEEE double expression on both sides, ranked on the raw statistic
    with a type tie-break."""
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def minmax_partial(t: pa.Table) -> pa.Table:
        # empty-batch guard: .min()/.max() on a zero-length array raises
        if t.num_rows == 0:
            return pa.table(
                {
                    "lo": pa.array([], type=pa.int64()),
                    "hi": pa.array([], type=pa.int64()),
                }
            )
        us = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "lo": pa.array([int(us.min())], type=pa.int64()),
                "hi": pa.array([int(us.max())], type=pa.int64()),
            }
        )

    mm = ds.map_batches(minmax_partial, batch_format="pyarrow").aggregate(
        Min("lo"), Max("hi")
    )
    if mm is None or mm.get("min(lo)") is None:
        # zero-row events table: empty result with the stable schema
        return pa.table(
            {
                "event_type": pa.array([], type=pa.string()),
                "n_early": pa.array([], type=pa.int64()),
                "n_late": pa.array([], type=pa.int64()),
                "chi2": pa.array([], type=pa.float64()),
            }
        )
    lo, hi = int(mm["min(lo)"]), int(mm["max(hi)"])
    mid = (lo + hi) // 2

    def partial(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        late = ts > mid
        types, inv = np.unique(et, return_inverse=True)
        ne = np.bincount(inv, weights=~late).astype(np.int64)
        nl = np.bincount(inv, weights=late).astype(np.int64)
        return pa.table(
            {
                "event_type": pa.array(list(types), type=pa.string()),
                "n_early": pa.array(ne),
                "n_late": pa.array(nl),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .sum(["n_early", "n_late"])
        .take_all()
    )  # ≤ |types| rows
    types = [r["event_type"] for r in rows]
    a = np.array([int(r["sum(n_early)"]) for r in rows], dtype=np.int64)
    b = np.array([int(r["sum(n_late)"]) for r in rows], dtype=np.int64)
    te, tl = int(a.sum()), int(b.sum())
    n = te + tl
    af, bf = a.astype(np.float64), b.astype(np.float64)
    cf = (te - a).astype(np.float64)
    df_ = (tl - b).astype(np.float64)
    d2 = af * df_ - bf * cf
    num = float(n) * d2 * d2
    den = ((a + b).astype(np.float64) * (n - a - b).astype(np.float64)) * (
        float(te) * float(tl)
    )
    chi = num / den
    order = sorted(range(len(types)), key=lambda i: (-chi[i], types[i]))
    return pa.table(
        {
            "event_type": pa.array([types[i] for i in order], type=pa.string()),
            "n_early": pa.array([int(a[i]) for i in order], type=pa.int64()),
            "n_late": pa.array([int(b[i]) for i in order], type=pa.int64()),
            "chi2": pa.array(
                qround6(chi, "drift_chi2")[order]
                if len(order)
                else np.array([], dtype=np.float64)
            ),
        }
    )


SQL_DRIFT_CHI2 = """
WITH mm AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
),
g AS (
  SELECT event_type,
         CAST(sum(CASE WHEN epoch_us(ts) > (lo + hi) // 2 THEN 0 ELSE 1 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN epoch_us(ts) > (lo + hi) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM events, mm GROUP BY 1
),
tot AS (SELECT CAST(sum(a) AS BIGINT) AS te, CAST(sum(b) AS BIGINT) AS tl FROM g),
sc AS (
  SELECT event_type, a, b,
         (CAST(te + tl AS DOUBLE)
          * (CAST(a AS DOUBLE) * CAST(tl - b AS DOUBLE)
             - CAST(b AS DOUBLE) * CAST(te - a AS DOUBLE))
          * (CAST(a AS DOUBLE) * CAST(tl - b AS DOUBLE)
             - CAST(b AS DOUBLE) * CAST(te - a AS DOUBLE)))
         / ((CAST(a + b AS DOUBLE) * CAST((te + tl) - a - b AS DOUBLE))
            * (CAST(te AS DOUBLE) * CAST(tl AS DOUBLE))) AS chi2_raw
  FROM g, tot
)
SELECT event_type, a AS n_early, b AS n_late, {QR} AS chi2
FROM sc ORDER BY chi2_raw DESC, event_type
""".format(QR=sql_qround6("chi2_raw"))


def sql_theme_polygon_area_branches(mapping):
    """Per-theme way-polygon (theme, id, refs) branches — matcher and
    routing conditions identical to _themed_feature_selects' polygon
    branch, with refs re-extracted for the coordinate walk."""
    from osm_export_tool_python_ray.pipelines.export_oracle import (
        matcher_sql,
        polygonish_sql,
    )

    poly = polygonish_sql()
    branches = []
    for t in mapping.themes:
        if not t.polygons:
            continue
        m = matcher_sql(t.matcher.expr)
        branches.append(
            "SELECT '%s' AS theme, id, CAST(json_extract(txt, '$.refs') AS BIGINT[]) AS refs "
            "FROM wstat WHERE tagged AND complete AND closed AND %s AND %s"
            % (t.name.replace("'", "''"), poly, m)
        )
    return "wpoly AS (\n" + "\nUNION ALL\n".join(branches) + "\n)"


def _build_theme_polygon_area_sql():
    from osm_export_tool_python_ray.mapping import Mapping
    from osm_export_tool_python_ray.pipelines.export_oracle import _base_ctes

    path = corpus_path(n_shards=4)
    with open(
        os.path.join(os.path.dirname(__file__), "..", "mappings", "default.yml")
    ) as f:
        mapping = Mapping(f.read())
    return """
WITH {base},
{wpoly},
segs AS (
  SELECT theme, id, refs[i+1] AS r1, refs[i+2] AS r2
  FROM wpoly, UNNEST(range(0, len(refs) - 1)) r(i)
),
segc AS (
  SELECT s.theme, s.id,
         CAST(floor(n1.lon * 10000000 + 0.5) AS BIGINT) AS x1,
         CAST(floor(n1.lat * 10000000 + 0.5) AS BIGINT) AS y1,
         CAST(floor(n2.lon * 10000000 + 0.5) AS BIGINT) AS x2,
         CAST(floor(n2.lat * 10000000 + 0.5) AS BIGINT) AS y2
  FROM segs s
  JOIN nodes n1 ON n1.id = s.r1
  JOIN nodes n2 ON n2.id = s.r2
),
area AS (
  SELECT theme, id, abs(sum(x1 * y2 - x2 * y1)) AS a2
  FROM segc GROUP BY theme, id
)
SELECT theme, CAST(count(*) AS BIGINT) AS n_polys,
       CAST(sum(a2) AS BIGINT) AS area2_sum
FROM area GROUP BY theme ORDER BY theme
""".format(base=_base_ctes(path), wpoly=sql_theme_polygon_area_branches(mapping))


SQL_LINK_SCORES = """
WITH p AS (
  SELECT DISTINCT user_id,
         (event_id % 100) // 10 AS cx,
         (CAST(floor(event_id / 7.0) AS BIGINT) % 100) // 10 AS cy,
         epoch_us(ts) // 3600000000 AS hr
  FROM events
), e0 AS (
  SELECT a.user_id AS ua, b.user_id AS ub
  FROM p a JOIN p b
    ON a.cx = b.cx AND a.cy = b.cy AND a.hr = b.hr AND a.user_id < b.user_id
  GROUP BY a.user_id, b.user_id
  HAVING count(*) >= 2
), adj AS (
  SELECT ua AS c, ub AS n FROM e0 UNION ALL SELECT ub, ua FROM e0
), deg AS (
  SELECT c AS node, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY c
), adjc AS (
  -- the ENGINE's wedge cap, modeled: per center keep the 512 smallest
  -- neighbor ids (stages wedge expansion truncates at CAP=512 in
  -- (center, neighbor-asc) order) — identical below the cap, exact in
  -- any denser regime too
  SELECT c, n FROM (
    SELECT c, n, row_number() OVER (PARTITION BY c ORDER BY n) AS rk
    FROM adj
  ) WHERE rk <= 512
), wp AS (
  SELECT x.n AS v, y.n AS w
  FROM adjc x JOIN adjc y ON y.c = x.c AND x.n < y.n
), nc AS (
  SELECT v, w, CAST(count(*) AS BIGINT) AS n_common FROM wp GROUP BY v, w
)
SELECT e.ua AS user_a, e.ub AS user_b,
       CAST(coalesce(nc.n_common, 0) AS BIGINT) AS n_common,
       da.deg AS deg_a, db.deg AS deg_b,
       CAST(coalesce(nc.n_common, 0) * 1000000
            // (da.deg + db.deg - coalesce(nc.n_common, 0)) AS BIGINT) AS jaccard_ppm
FROM e0 e
LEFT JOIN nc ON nc.v = e.ua AND nc.w = e.ub
JOIN deg da ON da.node = e.ua
JOIN deg db ON db.node = e.ub
ORDER BY 1, 2
"""


def q_gpkg_layer_counts(sf_dir):
    """Container round-trip proof (S6 as an oracle row): flagship export →
    REAL binary GeoPackage (sinks.Geopackage → functions/containers.py,
    stdlib sqlite3) → the finished ``.gpkg`` is read BACK with sqlite3 and
    aggregated per layer × WKB geometry class (row count + osm_id sum).
    Matching the DuckDB re-derivation over the raw corpus proves the whole
    sink path — staging parquet, ThemeProjector, WKB encode, GPKG blob
    framing, sqlite insert — preserved every row, id and geometry class.
    The read-back loops Python rows by design: it is the *verifier* of a
    binary container, not a pipeline stage (the scale path writes the
    container from streamed staged parquet and never reads it back)."""
    import shutil
    import sqlite3
    import struct
    import tempfile

    from osm_export_tool_python_ray.sinks import Geopackage

    mapping, themed = _run_default_export()
    tmpdir = tempfile.mkdtemp(prefix="gpkg_oracle_", dir="/tmp")
    try:
        Geopackage(os.path.join(tmpdir, "out"), mapping).write_from(themed)
        db = sqlite3.connect(os.path.join(tmpdir, "out.gpkg"))
        try:
            layers = [
                r[0]
                for r in db.execute(
                    "SELECT table_name FROM gpkg_contents"
                    " WHERE data_type='features' ORDER BY table_name"
                )
            ]
            # WKB type → engine geometry class (Multi* folds onto its base)
            klass = {1: 1, 4: 1, 2: 2, 5: 2, 3: 3, 6: 3}
            rows = []
            for name in layers:
                cols = [c[1] for c in db.execute('PRAGMA table_info("%s")' % name)]
                has_id = "osm_id" in cols
                sel = 'SELECT geom%s FROM "%s"' % (", osm_id" if has_id else "", name)
                agg = {}
                for row in db.execute(sel):
                    # 8-byte GP header, then WKB: endian byte + u32 type
                    code = struct.unpack_from("<I", row[0], 9)[0]
                    gc = klass[code]
                    c, s = agg.get(gc, (0, 0))
                    agg[gc] = (c + 1, s + (row[1] if has_id else 0))
                for gc in sorted(agg):
                    c, s = agg[gc]
                    rows.append((name, gc, c, s))
        finally:
            db.close()
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    return pa.table(
        {
            "layer": pa.array([r[0] for r in rows], type=pa.string()),
            "geom_type": pa.array([r[1] for r in rows], type=pa.int64()),
            "n": pa.array([r[2] for r in rows], type=pa.int64()),
            "id_sum": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )


def _default_mapping():
    from osm_export_tool_python_ray.mapping import Mapping

    with open(os.path.join(os.path.dirname(__file__), "..", "mappings", "default.yml")) as f:
        return Mapping(f.read())


_EXPORT_CACHE = {}


def _run_default_export():
    """(mapping, themed features Dataset) for the default corpus+mapping.
    Memoized per process on the corpus path, with the themed Dataset
    materialized: six driver-contract queries consume the same export
    surface, and Ray re-executes lineage per consumption — without the
    cache the correctness gate runs the full export pipeline six times.
    Materializing here is driver-gate-sized (sf0.01 corpus); bench.py and
    the CLI never go through this path."""
    import ray.data

    from osm_export_tool_python_ray.pipelines.export import run_export

    path = corpus_path(n_shards=4)
    if path not in _EXPORT_CACHE:
        mapping = _default_mapping()
        themed = run_export(
            ray.data.read_parquet(path), mapping, num_partitions=4, num_buckets=16
        ).materialize()
        _EXPORT_CACHE[path] = (mapping, themed)
    return _EXPORT_CACHE[path]


def _split_layer_specs(mapping, out_base):
    """(theme_name, geom_class, container base path) for every layer a
    split-geometry sink (Shapefile/Kml) creates — the sink's deterministic
    naming contract (sinks._SplitContainerMixin), reconstructed here so the
    read-back opens files by name instead of trusting the sink's records."""
    from osm_export_tool_python_ray.sinks import _GEOM_NAMES
    from osm_export_tool_python_ray import make_filename

    specs = []
    for theme in mapping.themes:
        for gt, flag in ((1, theme.points), (2, theme.lines), (3, theme.polygons)):
            if flag:
                specs.append(
                    (
                        theme.name,
                        gt,
                        "%s_%s_%s" % (out_base, make_filename(theme.name), _GEOM_NAMES[gt]),
                    )
                )
    return specs


def _read_shp_dbf(base):
    """Parse a raw .shp/.dbf pair back to [(geom_class, osm_id|None)] —
    an independent decoder for the custom binary Shapefile encoder
    (functions/containers.ShapefileLayerWriter), stdlib struct only."""
    import struct

    cls = {1: 1, 3: 2, 5: 3}  # SHP_POINT / SHP_POLYLINE / SHP_POLYGON
    with open(base + ".shp", "rb") as f:
        data = f.read()
    shapes, off = [], 100
    while off + 12 <= len(data):
        _recno, clen = struct.unpack_from(">2i", data, off)
        shape = struct.unpack_from("<i", data, off + 8)[0]
        shapes.append(cls[shape])
        off += 8 + clen * 2
    with open(base + ".dbf", "rb") as f:
        d = f.read()
    nrec, hdr, rsz = struct.unpack_from("<IHH", d, 4)
    fields, p = [], 32
    while d[p] != 0x0D:
        name = d[p : p + 11].split(b"\x00")[0].decode("ascii")
        fields.append((name, d[p + 16]))
        p += 32
    has_id = bool(fields) and fields[0][0] == "osm_id"
    ids = []
    for i in range(nrec):
        if has_id:
            txt = d[hdr + i * rsz + 1 : hdr + i * rsz + 1 + fields[0][1]].strip()
            ids.append(int(txt) if txt else None)
        else:
            ids.append(None)
    if len(shapes) != nrec:
        raise ValueError("shp/dbf record count mismatch at %s" % base)
    return list(zip(shapes, ids))


def _read_kml(path):
    """Parse a .kml layer back to [(geom_class, osm_id|None)] via stdlib
    ElementTree — independent of the string-building KmlFile encoder."""
    import xml.etree.ElementTree as ET

    ns = "{http://www.opengis.net/kml/2.2}"
    out = []
    for pm in ET.parse(path).getroot().iter(ns + "Placemark"):
        oid = None
        for sd in pm.iter(ns + "SimpleData"):
            if sd.get("name") == "osm_id" and sd.text is not None:
                oid = int(sd.text)
        gc = None
        for tag, c in ((ns + "Point", 1), (ns + "LineString", 2), (ns + "Polygon", 3)):
            if pm.find(tag) is not None:
                gc = c
        mg = pm.find(ns + "MultiGeometry")
        if mg is not None:
            gc = 2 if mg.find(ns + "LineString") is not None else 3
        if gc is None:
            raise ValueError("Placemark without geometry in %s" % path)
        out.append((gc, oid))
    return out


def _read_geojsonl(path):
    """Parse a .geojsonl layer back to [(geom_class, osm_id|None)] via
    stdlib json — independent of the dict-building GeoJsonSeqFile
    encoder."""
    import json as _json

    cls = {
        "Point": 1,
        "LineString": 2, "MultiLineString": 2,
        "Polygon": 3, "MultiPolygon": 3,
    }
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            feat = _json.loads(line)
            if feat.get("type") != "Feature" or "geometry" not in feat:
                raise ValueError("non-Feature line in %s" % path)
            out.append(
                (cls[feat["geometry"]["type"]], feat.get("id"))
            )
    return out


def _layer_counts_table(rows):
    """rows: [(layer, geom_class, osm_id|None)] → aggregated Arrow table
    (layer, geom_type, n, id_sum) sorted by key."""
    agg = {}
    for layer, gc, oid in rows:
        c, s = agg.get((layer, gc), (0, 0))
        agg[(layer, gc)] = (c + 1, s + (oid or 0))
    keys = sorted(agg)
    return pa.table(
        {
            "layer": pa.array([k[0] for k in keys], type=pa.string()),
            "geom_type": pa.array([k[1] for k in keys], type=pa.int64()),
            "n": pa.array([agg[k][0] for k in keys], type=pa.int64()),
            "id_sum": pa.array([agg[k][1] for k in keys], type=pa.int64()),
        }
    )


def q_shp_layer_counts(sf_dir):
    """Container round-trip proof (S7): flagship export → REAL binary
    Shapefile sets (.shp/.shx/.dbf, functions/containers.py) → the raw
    files are parsed BACK with an independent stdlib decoder and
    aggregated per theme × shape class (count + osm_id sum from the DBF
    numeric field). Matching the DuckDB re-derivation over the raw corpus
    proves the split-geometry staging, WKB→SHP record encode and DBF
    attribute encode preserved every row, id and geometry class."""
    import shutil
    import tempfile

    from osm_export_tool_python_ray.sinks import Shapefile

    mapping, themed = _run_default_export()
    tmpdir = tempfile.mkdtemp(prefix="shp_oracle_", dir="/tmp")
    try:
        out = os.path.join(tmpdir, "out")
        Shapefile(out, mapping).write_from(themed)
        rows = []
        for theme_name, _gt, base in _split_layer_specs(mapping, out):
            if os.path.exists(base + ".shp"):
                rows.extend((theme_name, gc, oid) for gc, oid in _read_shp_dbf(base))
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    return _layer_counts_table(rows)


def q_kml_layer_counts(sf_dir):
    """Container round-trip proof (S8): flagship export → REAL .kml layers
    (functions/containers.KmlFile) → parsed BACK with stdlib ElementTree
    and aggregated per theme × KML geometry class. Same oracle shape as
    the gpkg/shp rows; proves the XML encode (escaping, schema data,
    geometry serialization) preserved every row, id and geometry class."""
    import shutil
    import tempfile

    from osm_export_tool_python_ray.sinks import Kml

    mapping, themed = _run_default_export()
    tmpdir = tempfile.mkdtemp(prefix="kml_oracle_", dir="/tmp")
    try:
        out = os.path.join(tmpdir, "out")
        Kml(out, mapping).write_from(themed)
        rows = []
        for theme_name, _gt, base in _split_layer_specs(mapping, out):
            if os.path.exists(base + ".kml"):
                rows.extend((theme_name, gc, oid) for gc, oid in _read_kml(base + ".kml"))
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    return _layer_counts_table(rows)


def q_geojson_layer_counts(sf_dir):
    """Container round-trip proof (GeoJSONSeq — the engine's added text
    container): flagship export → REAL newline-delimited RFC 7946
    features (functions/containers.GeoJsonSeqFile) → parsed BACK with
    stdlib json and aggregated per theme × geometry class. Same oracle
    shape as the gpkg/shp/kml rows; proves the JSON encode (id member,
    only-present properties, nested coordinate arrays) preserved every
    row, id and geometry class."""
    import shutil
    import tempfile

    from osm_export_tool_python_ray.sinks import GeoJsonSeq

    mapping, themed = _run_default_export()
    tmpdir = tempfile.mkdtemp(prefix="geojsonl_oracle_", dir="/tmp")
    try:
        out = os.path.join(tmpdir, "out")
        GeoJsonSeq(out, mapping).write_from(themed)
        rows = []
        for theme_name, _gt, base in _split_layer_specs(mapping, out):
            if os.path.exists(base + ".geojsonl"):
                rows.extend(
                    (theme_name, gc, oid)
                    for gc, oid in _read_geojsonl(base + ".geojsonl")
                )
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    return _layer_counts_table(rows)


def span_adjacency(docs_ds):
    """Span-sequence transition counts over an interleaved documents
    dataset (doc_id, spans) — see q_span_adjacency."""

    def partial(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(spans)
        EMPTY = pa.table(
            {
                "kind_a": pa.array([], type=pa.string()),
                "kind_b": pa.array([], type=pa.string()),
                "n_p": pa.array([], type=pa.int64()),
                "gap_p": pa.array([], type=pa.int64()),
            }
        )
        if not len(parent):
            return EMPTY
        off = flat.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
        dk = pc.dictionary_encode(flat.field("kind"))
        if isinstance(dk, pa.ChunkedArray):
            dk = dk.combine_chunks()
        codes = np.asarray(dk.indices, dtype=np.int64)
        kinds = dk.dictionary.to_pylist()  # batch-local dictionary
        order = np.lexsort((off, parent))
        par_s, off_s, code_s = parent[order], off[order], codes[order]
        same = par_s[1:] == par_s[:-1]
        if not same.any():
            return EMPTY
        a, b = code_s[:-1][same], code_s[1:][same]
        gaps = (off_s[1:] - off_s[:-1])[same]
        K = len(kinds)
        key = a * K + b
        o2 = np.argsort(key, kind="stable")
        ks, gs = key[o2], gaps[o2]
        starts = np.nonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))[0]
        uk = ks[starts]
        n = np.diff(np.append(starts, len(ks))).astype(np.int64)
        gsum = np.add.reduceat(gs, starts).astype(np.int64)  # pure int64
        return pa.table(
            {
                "kind_a": pa.array([kinds[int(k) // K] for k in uk]),
                "kind_b": pa.array([kinds[int(k) % K] for k in uk]),
                "n_p": pa.array(n),
                "gap_p": pa.array(gsum),
            }
        )

    from ray.data.aggregate import Sum

    return (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["kind_a", "kind_b"])
        .aggregate(Sum("n_p", alias_name="n"), Sum("gap_p", alias_name="gap_sum"))
    )


def q_span_adjacency(sf_dir):
    """Span-sequence transition counts over the interleaved corpus — the
    north-rule per-row invariant (kind/text/media_ref ORDER preserved
    through every stage) turned into a measurable query: for every
    consecutive span pair within a document (by offset order), count
    transitions kind_a → kind_b and sum the offset gaps. Any stage that
    reorders, drops or duplicates a span flips a transition count or a
    gap sum. Pure combiner shape: per-batch (kind_a, kind_b, n, gap_sum)
    partials via list_parent_indices + one lexsort; the groupby moves
    O(kinds²) rows per batch, never spans. Offsets are strictly
    increasing within a doc by corpus construction, so the SQL
    row_number ORDER BY offset is total on both sides."""
    import ray.data

    return span_adjacency(ray.data.read_parquet(corpus_path(n_shards=4)))


def sql_span_adjacency(corpus):
    return f"""
WITH s AS (
  SELECT doc_id, u.kind AS kind, u."offset" AS off,
         row_number() OVER (PARTITION BY doc_id ORDER BY u."offset") AS rn
  FROM (SELECT doc_id, UNNEST(spans) AS u FROM read_parquet('{corpus}'))
)
SELECT a.kind AS kind_a, b.kind AS kind_b, count(*) AS n,
       CAST(sum(b.off - a.off) AS BIGINT) AS gap_sum
FROM s a JOIN s b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
GROUP BY kind_a, kind_b
"""


def q_cohort_retention(sf_dir):
    """Weekly cohort retention matrix (stages/analytics.py
    cohort_retention): per (cohort_week, week_offset) active-user counts
    where cohort_week is the epoch week of a user's first event. The
    exchange moves distinct (user, week) presence rows (batch combiner),
    cohorting is a per-user segment min inside one user-keyed
    grouped_map, and the final groupby folds O(weeks²) partial rows per
    partition — never user rows."""
    from osm_export_tool_python_ray.stages.analytics import cohort_retention

    return cohort_retention(_read(sf_dir, "events", ["user_id", "ts"]))


SQL_COHORT_RETENTION = """
WITH p AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 604800000000 AS week
  FROM events
), c AS (
  SELECT user_id, min(week) AS cohort_week FROM p GROUP BY user_id
)
SELECT c.cohort_week, p.week - c.cohort_week AS week_offset,
       count(*) AS users
FROM p JOIN c ON p.user_id = c.user_id
GROUP BY c.cohort_week, week_offset
"""


def q_idw_grid(sf_dir):
    """Inverse-distance-weighted interpolation surface (stages/
    analytics.py idw_grid): the event `value` field interpolated at a
    fixed 5×5 probe grid with exact integer weights
    w = 1e6 // (d² + 1) and 1e-4-quantized values, so the (Σw, Σwv)
    partials fold in any order and the floor-division ratio matches the
    oracle bit-for-bit. Pure combiner shape: 25 partial rows per batch,
    no event exchange."""
    from osm_export_tool_python_ray.stages.analytics import idw_grid

    return idw_grid(_read(sf_dir, "events", ["event_id", "value"]))


SQL_IDW_GRID = """
WITH probes AS (
  SELECT (i // 5) AS gx, (i % 5) AS gy,
         (i // 5) * 20 + 10 AS px, (i % 5) * 20 + 10 AS py
  FROM range(25) t(i)
), pts AS (
  SELECT CAST(event_id % 100 AS BIGINT) AS x,
         CAST(event_id // 7 AS BIGINT) % 100 AS y,
         CAST(floor(value * 1e4 + 0.5) AS BIGINT) AS vq
  FROM events
), terms AS (
  SELECT p.gy * 5 + p.gx AS probe_id, p.px, p.py,
         1000000 // ((pts.x - p.px) * (pts.x - p.px)
                   + (pts.y - p.py) * (pts.y - p.py) + 1) AS w,
         vq
  FROM probes p CROSS JOIN pts
)
SELECT probe_id, px, py,
       CAST(sum(w) AS BIGINT) AS wsum,
       CAST(sum(w * vq) AS BIGINT) // CAST(greatest(sum(w), 1) AS BIGINT)
         AS idw_q
FROM terms GROUP BY probe_id, px, py
"""


def q_hausdorff_pairs(sf_dir):
    """Trajectory-similarity join (stages/analytics.py hausdorff_pairs):
    symmetric discrete Hausdorff distance (squared int64) between
    per-user distinct point sets — capped to the 16 lexicographically
    smallest points per user, candidate pairs blocked by the anchor
    point's 20×20 cell. Two keyed exchanges (user pack, anchor-cell pair
    expansion), vectorized per-pair distance matrices, counted bucket
    cap. The oracle re-derives the row_number cut, the anchor blocking
    and the max-min distance with plain SQL aggregation."""
    from osm_export_tool_python_ray.stages.analytics import hausdorff_pairs

    return hausdorff_pairs(_read(sf_dir, "events", ["event_id", "user_id"]))


SQL_HAUSDORFF_PAIRS = """
WITH pts0 AS (
  SELECT DISTINCT user_id,
         CAST(event_id % 100 AS BIGINT) AS x,
         CAST(event_id // 7 AS BIGINT) % 100 AS y
  FROM events
), ranked AS (
  SELECT user_id, x, y,
         row_number() OVER (PARTITION BY user_id ORDER BY x, y) AS rn
  FROM pts0
), pts AS (
  SELECT * FROM ranked WHERE rn <= 16
), anchors0 AS (
  SELECT user_id, (x // 20) * 5 + (y // 20) AS bkey FROM pts WHERE rn = 1
), anchors AS (
  -- the ENGINE's bucket cap, modeled: per anchor cell keep the 256
  -- smallest user_ids (stages/analytics.py hausdorff_pairs
  -- bucket_cap; caught by the round-5 sf0.1 sweep — rows 117,886 vs an
  -- uncapped oracle's 280,537)
  SELECT user_id, bkey FROM (
    SELECT user_id, bkey,
           row_number() OVER (PARTITION BY bkey ORDER BY user_id) AS brk
    FROM anchors0
  ) WHERE brk <= 256
), cand AS (
  SELECT a.user_id AS ua, b.user_id AS ub
  FROM anchors a JOIN anchors b
    ON a.bkey = b.bkey AND a.user_id < b.user_id
), dmat AS (
  SELECT c.ua, c.ub, p1.rn AS ra, p2.rn AS rb,
         (p1.x - p2.x) * (p1.x - p2.x) + (p1.y - p2.y) * (p1.y - p2.y) AS d2
  FROM cand c
  JOIN pts p1 ON p1.user_id = c.ua
  JOIN pts p2 ON p2.user_id = c.ub
), dir_ab AS (
  SELECT ua, ub, ra, min(d2) AS md FROM dmat GROUP BY ua, ub, ra
), h_ab AS (
  SELECT ua, ub, max(md) AS h FROM dir_ab GROUP BY ua, ub
), dir_ba AS (
  SELECT ua, ub, rb, min(d2) AS md FROM dmat GROUP BY ua, ub, rb
), h_ba AS (
  SELECT ua, ub, max(md) AS h FROM dir_ba GROUP BY ua, ub
)
SELECT h_ab.ua AS user_a, h_ab.ub AS user_b,
       greatest(h_ab.h, h_ba.h) AS haus_d2
FROM h_ab JOIN h_ba ON h_ab.ua = h_ba.ua AND h_ab.ub = h_ba.ub
"""


def q_decayed_cells(sf_dir):
    """Time-decayed cell heat (stages/analytics.py decayed_cells):
    per 10×10 coarse cell, count and exponentially decayed weight
    Σ 1e6 // 2^(age_h // 24h) against the fixed reference instant
    2024-02-01T00:00:00Z — the streaming-hotspot op with a pure-integer
    decay so partials fold in any order. Pure combiner shape."""
    from osm_export_tool_python_ray.stages.analytics import decayed_cells

    return decayed_cells(_read(sf_dir, "events", ["event_id", "ts"]))


SQL_DECAYED_CELLS = """
WITH e AS (
  SELECT (CAST(event_id % 100 AS BIGINT)) // 10 AS cx,
         (CAST(event_id // 7 AS BIGINT) % 100) // 10 AS cy,
         least(greatest(1706745600000000 - epoch_us(ts), 0)
               // 3600000000 // 24, 40) AS k
  FROM events
)
SELECT cx, cy, count(*) AS n,
       CAST(sum(1000000 // CAST(pow(2, k) AS BIGINT)) AS BIGINT) AS decayed
FROM e GROUP BY cx, cy
"""


def q_tfidf_cosine_pairs(sf_dir):
    """AllPairs prefix-filtered TF-IDF cosine similarity self-join
    (stages/simjoin.py tfidf_cosine_pairs, after Bayardo et al. WWW'07):
    every document pair with cosine >= 0.8 over milli-quantized
    L2-normalized tf·idf vectors. The prefix filter is lossless (only
    prefix postings generate candidates; verification computes the exact
    integer dot), so the oracle is a brute-force term self-join with the
    identical integer quantization chain — threshold compared as
    25·dot² >= 16·ssq_a·ssq_b in pure int64 on both sides."""
    import pyarrow.parquet as _pq

    from osm_export_tool_python_ray.stages.simjoin import tfidf_cosine_pairs

    n_docs = _pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")
    ).num_rows
    return tfidf_cosine_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), n_docs
    ).sort(["doc_a", "doc_b"])


SQL_TFIDF_COSINE_PAIRS = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS nd FROM documents),
w AS (
  -- idf milli-units via the boundary-safe quantizer (mirrors
  -- functions/quantize.py qround — the round-4 hash divergence fix)
  SELECT t.doc_id, t.term,
         t.tf * {QR_IDF} AS w
  FROM tf t JOIN df USING (term), n
),
ssq0 AS (SELECT doc_id, sum(w * w) AS s0 FROM w GROUP BY 1),
wn AS (
  -- the one deterministic float chain, identical op order to numpy:
  -- (w * 1000.0) / sqrt(double(ssq0)) + 0.5, floored
  SELECT w.doc_id, w.term,
         CAST(floor(CAST(w AS DOUBLE) * 1000.0
                    / sqrt(CAST(s0 AS DOUBLE)) + 0.5) AS BIGINT) AS wn
  FROM w JOIN ssq0 USING (doc_id) WHERE s0 > 0
),
s2 AS (SELECT doc_id, sum(wn * wn) AS ssq FROM wn GROUP BY 1),
-- prefix flags re-derived per (doc, term): inclusive-suffix norm in the
-- global (df asc, term asc) feature order still reaches the threshold —
-- the Bayardo prefix condition, identical int64 arithmetic to
-- stages/simjoin.py doc_vectors
pref AS (
  SELECT w2.doc_id, w2.term, w2.wn,
         25 * sum(w2.wn * w2.wn) OVER (
             PARTITION BY w2.doc_id ORDER BY d2.df, w2.term
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           >= 16 * s.ssq AS pref
  FROM wn w2 JOIN df d2 USING (term) JOIN s2 s USING (doc_id)
),
posting AS (SELECT term, count(*) AS np FROM pref GROUP BY term),
-- candidate model = the ENGINE's capped generation, exactly: a pair is
-- a candidate iff some shared term's FULL posting is within the
-- max_group cap and at least one side holds the term in its prefix
-- (pref×pref + pref×nonpref; hot postings are skipped ENTIRELY, the
-- counted approximation — so this oracle is exact at EVERY scale, the
-- sf0.1 hot-posting regime included, not just below the cap)
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pref a JOIN pref b USING (term) JOIN posting p USING (term)
  WHERE a.doc_id < b.doc_id AND p.np <= 500 AND (a.pref OR b.pref)
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(sum(a.wn * b.wn) AS BIGINT) AS dot
  FROM wn a JOIN wn b USING (term)
  JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, dot, sa.ssq AS ssq_a, sb.ssq AS ssq_b
FROM dots
JOIN s2 sa ON sa.doc_id = doc_a
JOIN s2 sb ON sb.doc_id = doc_b
WHERE 25 * dot * dot >= 16 * sa.ssq * sb.ssq
ORDER BY doc_a, doc_b
""".format(
    QR_IDF=sql_qround(
        "ln((CAST(nd AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) * 1000.0"
    )
)


def q_kcore(sf_dir):
    """k-core decomposition (stages/graph.py kcore_members, Seidman
    1983): the maximal subgraph of the sparse co-location graph
    (2×2-cell / 15-min encounters) where every user keeps degree >= 30,
    by iterative peel to fixpoint — degree fold + two semi-joins per
    round, driver state one integer, unconverged exits counted via
    report_cap. The oracle re-derives the peel with a recursive CTE
    (DuckDB allows aggregation over the recursive reference) run past
    fixpoint to a fixed horizon; peel depth at this scale is 3 rounds
    (measured), horizon 8."""
    from osm_export_tool_python_ray.stages.graph import kcore_members
    from osm_export_tool_python_ray.stages.journey import encounters

    pairs = encounters(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        cell_div=2,
        bucket_us=900_000_000,
    )
    # NO .sort(): the sf0.001 core is legitimately EMPTY and ray.data's
    # Sort loses the schema of an all-empty dataset (blocks in, no
    # schema out); the driver compare sorts rows itself.
    return kcore_members(pairs, k=30)


SQL_KCORE = """
WITH RECURSIVE p AS (
  SELECT DISTINCT user_id, (event_id % 100) // 2 AS cx,
         (CAST(floor(event_id / 7.0) AS BIGINT) % 100) // 2 AS cy,
         epoch_us(ts) // 900000000 AS hr
  FROM events
),
e AS (
  SELECT a.user_id AS ua, b.user_id AS ub
  FROM p a JOIN p b
    ON a.cx = b.cx AND a.cy = b.cy AND a.hr = b.hr AND a.user_id < b.user_id
  GROUP BY 1, 2
),
und AS (SELECT ua AS node, ub AS other FROM e UNION ALL SELECT ub, ua FROM e),
alive(it, node) AS (
  SELECT 0, node FROM (SELECT DISTINCT node FROM und)
  UNION
  -- peel: keep nodes whose degree among the PREVIOUS level's
  -- survivors is >= k; run past fixpoint to the it=8 horizon (node
  -- sets shrink monotonically, so post-fixpoint levels just repeat)
  SELECT it + 1, node FROM (
    SELECT al.it, u.node, count(*) AS deg
    FROM alive al
    JOIN und u ON u.node = al.node
    JOIN alive al2 ON al2.it = al.it AND al2.node = u.other
    GROUP BY al.it, u.node
  ) WHERE deg >= 30 AND it < 8
),
core AS (SELECT node FROM alive WHERE it = 8)
SELECT u.node, count(*) AS deg
FROM und u
JOIN core c1 ON c1.node = u.node
JOIN core c2 ON c2.node = u.other
GROUP BY u.node
ORDER BY u.node
"""


def q_snm_pairs(sf_dir):
    """Sorted-neighborhood blocking (stages/snm.py, Hernández & Stolfo
    SIGMOD'95): all candidate pairs within a 4-wide window of the global
    (blocking key, doc_id) sort order, key = first 12 chars of the
    lowered alnum-squashed text. Exact two-phase global rank (range
    buckets on the order-isomorphic packed key, O(num_buckets) driver
    ints) + a rank-chunked halo exchange; candidate volume is linear,
    ≤ 3·N pairs."""
    from osm_export_tool_python_ray.stages.snm import sorted_neighborhood_pairs

    return sorted_neighborhood_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), window=4
    )


SQL_SNM_PAIRS = """
WITH k AS (
  SELECT doc_id,
         substr(regexp_replace(lower(coalesce(text, '')),
                               '[^a-z0-9]+', '', 'g'), 1, 12) AS bkey
  FROM documents
),
r AS (
  SELECT doc_id, bkey,
         row_number() OVER (ORDER BY bkey, doc_id) AS rk
  FROM k
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       b.rk - a.rk AS dist, a.bkey AS key_a, b.bkey AS key_b
FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 3
ORDER BY doc_a, doc_b, dist
"""


def q_graph_walks(sf_dir):
    """Deterministic random-walk corpus (stages/graph.py graph_walks;
    DeepWalk KDD'14): one 4-step walk per node of the sparse co-location
    graph, step index = splitmix64((walk·P) XOR step) mod deg — the
    engine's mix64 family, re-derived exactly in SQL via _sql_mix64, so
    walks are bit-identical across runs, parallelism levels and the
    oracle. Adjacency indexed once; each step is one node-keyed
    exchange."""
    from osm_export_tool_python_ray.stages.graph import graph_walks
    from osm_export_tool_python_ray.stages.journey import encounters

    pairs = encounters(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        cell_div=2,
        bucket_us=900_000_000,
    )
    return graph_walks(pairs, length=4).sort(["walk", "step"])


def _build_graph_walks_sql(length=4):
    P = 0x9E3779B97F4A7C15
    mix = _sql_mix64("hx")
    parts = [
        """
WITH p AS (
  SELECT DISTINCT user_id, (event_id % 100) // 2 AS cx,
         (CAST(floor(event_id / 7.0) AS BIGINT) % 100) // 2 AS cy,
         epoch_us(ts) // 900000000 AS hr
  FROM events
),
e AS (
  SELECT a.user_id AS ua, b.user_id AS ub
  FROM p a JOIN p b
    ON a.cx = b.cx AND a.cy = b.cy AND a.hr = b.hr AND a.user_id < b.user_id
  GROUP BY 1, 2
),
und AS (SELECT ua AS src, ub AS dst FROM e UNION ALL SELECT ub, ua FROM e),
adj AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,
         count(*) OVER (PARTITION BY src) AS deg
  FROM und
),
wk0 AS (SELECT DISTINCT src AS walk, src AS cur, __HW__ AS hw FROM und)""".replace(
            "__HW__",
            _sql_mulmod64("CAST(src AS UBIGINT)", "CAST('%d' AS UBIGINT)" % P),
        )
    ]
    for s in range(1, length + 1):
        parts.append(
            """,
hx{s} AS (SELECT walk, hw, cur,
                 xor(hw, CAST({s} AS UBIGINT)) AS hx FROM wk{prev}),
wk{s} AS (
  SELECT h.walk, h.hw, a.dst AS cur
  FROM hx{s} h JOIN adj a
    ON a.src = h.cur
   AND a.idx = CAST((__MIX__) % CAST(a.deg AS UBIGINT) AS BIGINT)
)""".replace("__MIX__", mix).format(s=s, prev=s - 1)
        )
    sel = ["SELECT walk, 0 AS step, cur AS node FROM wk0"]
    for s in range(1, length + 1):
        sel.append(
            "SELECT walk, %d AS step, cur AS node FROM wk%d" % (s, s)
        )
    parts.append("\n" + "\nUNION ALL\n".join(sel) + "\nORDER BY walk, step")
    return "".join(parts)


SQL_GRAPH_WALKS = _build_graph_walks_sql(4)


def q_entity_clusters(sf_dir):
    """Merge/purge entity resolution END-TO-END (the composition the
    SNM paper is actually for): sorted-neighborhood blocking
    (stages/snm.py) → match rule (8-char blocking-key prefix equality,
    vectorized Arrow filter) → connected components
    (stages/dedup.py dedup_clusters) → (doc_id, cluster_id = min doc of
    the component). One oracle re-derives the whole chain: window
    self-join on ranks → substr-prefix filter → recursive min-label
    walk."""
    import pyarrow.compute as _pc

    from osm_export_tool_python_ray.stages.dedup import dedup_clusters
    from osm_export_tool_python_ray.stages.snm import sorted_neighborhood_pairs

    pairs = sorted_neighborhood_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), window=4
    )

    def verify(t: pa.Table) -> pa.Table:
        ka = _pc.utf8_slice_codeunits(t.column("key_a"), 0, 8)
        kb = _pc.utf8_slice_codeunits(t.column("key_b"), 0, 8)
        f = t.filter(_pc.equal(ka, kb))
        return pa.table({"doc_a": f.column("doc_a"), "doc_b": f.column("doc_b")})

    return dedup_clusters(
        pairs.map_batches(verify, batch_format="pyarrow")
    ).sort("doc_id")


SQL_ENTITY_CLUSTERS = r"""
WITH k AS (
  SELECT doc_id,
         substr(regexp_replace(lower(coalesce(text, '')),
                               '[^a-z0-9]+', '', 'g'), 1, 12) AS bkey
  FROM documents
),
r AS (
  SELECT doc_id, bkey,
         row_number() OVER (ORDER BY bkey, doc_id) AS rk
  FROM k
),
vp AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 3
  WHERE substr(a.bkey, 1, 8) = substr(b.bkey, 1, 8)
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM vp
  UNION ALL SELECT doc_b, doc_a FROM vp
),
""" + _CC_CHAIN + """
SELECT node AS doc_id, label AS cluster_id FROM """ + _CC_FINAL + """
ORDER BY doc_id
"""


def q_local_supplier_volume(sf_dir):
    """TPC-H Q5-shaped multiway join tree (the classic star-join
    composition test the engine had not yet exercised end-to-end):
    revenue from lineitems whose CUSTOMER and SUPPLIER sit in the same
    ASIA nation, orders inside calendar 1996, grouped by nation.

    Scale shape: region/nation are broadcast-tiny (≤25 rows — read once
    on the driver, shipped in task closures), while customer, orders,
    lineitem and supplier all STREAM through three bucketed exchanges —
    orders⋈customer on custkey, lineitem⋈that on orderkey, ⋈supplier on
    suppkey — the canonical fact-to-fact plan; no big side is ever
    materialized or broadcast. Revenue is quantized per-row to integer
    1e-4 units (extendedprice and discount both carry ≤2 decimals, so
    price*(1-discount) is exact at 4; floor(x*1e4+0.5) is the identical
    IEEE expression on both sides) and summed in int64 via keyed_sum —
    summation-order independent, no float-boundary hash flakes."""
    from osm_export_tool_python_ray.stages.exchange import keyed_sum
    from osm_export_tool_python_ray.stages.joins import bucket_join

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rnames = np.asarray(region.column("r_name").to_pylist(), dtype=object)
    rkey = region.column("r_regionkey").to_numpy()[rnames == "ASIA"][0]
    nmask = nation.column("n_regionkey").to_numpy() == rkey
    nat_keys = nation.column("n_nationkey").to_numpy()[nmask].astype(np.int64)
    nat_names = np.asarray(nation.column("n_name").to_pylist(), dtype=object)[nmask]
    name_of = dict(zip(nat_keys.tolist(), nat_names.tolist()))

    t0 = np.datetime64("1996-01-01", "us").astype(np.int64)
    t1 = np.datetime64("1997-01-01", "us").astype(np.int64)

    def cust_prep(t: pa.Table) -> pa.Table:
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(nk, nat_keys)
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False)[keep]
        return pa.table({"custkey": pa.array(ck), "c_nat": pa.array(nk[keep])})

    def orders_prep(t: pa.Table) -> pa.Table:
        ts = (
            t.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        keep = (ts >= t0) & (ts < t1)
        return pa.table(
            {
                "custkey": pa.array(
                    t.column("o_custkey").to_numpy(zero_copy_only=False)[keep]
                ),
                "orderkey": pa.array(
                    t.column("o_orderkey").to_numpy(zero_copy_only=False)[keep]
                ),
            }
        )

    def line_prep(t: pa.Table) -> pa.Table:
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1.0 - dc) * 10000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "orderkey": t.column("l_orderkey"),
                "suppkey": t.column("l_suppkey"),
                "rev_e4": pa.array(rev),
            }
        )

    def supp_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "suppkey": t.column("s_suppkey"),
                "s_nat": pa.array(
                    t.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_prep, batch_format="pyarrow"
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_prep, batch_format="pyarrow")
    line = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(line_prep, batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        supp_prep, batch_format="pyarrow"
    )

    cust_schema = pa.schema([("custkey", pa.int64()), ("c_nat", pa.int64())])
    ord_schema = pa.schema([("custkey", pa.int64()), ("orderkey", pa.int64())])
    oc = bucket_join(
        orders, cust, "custkey", left_schema=ord_schema, right_schema=cust_schema
    ).select_columns(["orderkey", "c_nat"])

    line_schema = pa.schema(
        [("orderkey", pa.int64()), ("suppkey", pa.int64()), ("rev_e4", pa.int64())]
    )
    oc_schema = pa.schema([("orderkey", pa.int64()), ("c_nat", pa.int64())])
    lo = bucket_join(
        line, oc, "orderkey", left_schema=line_schema, right_schema=oc_schema
    ).select_columns(["suppkey", "rev_e4", "c_nat"])

    lo_schema = pa.schema(
        [("suppkey", pa.int64()), ("rev_e4", pa.int64()), ("c_nat", pa.int64())]
    )
    supp_schema = pa.schema([("suppkey", pa.int64()), ("s_nat", pa.int64())])
    ls = bucket_join(
        lo, supp, "suppkey", left_schema=lo_schema, right_schema=supp_schema
    )

    def local_only(t: pa.Table) -> pa.Table:
        cn = t.column("c_nat").to_numpy(zero_copy_only=False)
        sn = t.column("s_nat").to_numpy(zero_copy_only=False)
        keep = cn == sn
        return pa.table(
            {
                "natkey": pa.array(cn[keep]),
                "rev_e4": pa.array(
                    t.column("rev_e4").to_numpy(zero_copy_only=False)[keep]
                ),
            }
        )

    per_nat = keyed_sum(
        ls.map_batches(local_only, batch_format="pyarrow"),
        ["natkey"],
        [("rev_e4", "revenue_e4")],
    )

    # ≤ |nations-in-region| rows from here on — tiny by construction
    rows = per_nat.take_all()
    names = [name_of[int(r["natkey"])] for r in rows]
    revs = [int(r["revenue_e4"]) for r in rows]
    order = sorted(range(len(rows)), key=lambda i: (-revs[i], names[i]))
    return pa.table(
        {
            "n_name": pa.array([names[i] for i in order], type=pa.string()),
            "revenue_e4": pa.array([revs[i] for i in order], type=pa.int64()),
        }
    )


SQL_LOCAL_SUPPLIER_VOLUME = """
WITH nat AS (
  SELECT n_nationkey, n_name FROM nation
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
)
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nat ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue_e4 DESC, n_name
"""


def q_kmv_distinct(sf_dir):
    """KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002) — the
    mergeable distinct-count sketch the engine's sketch family (HLL,
    CMS, Bloom) did not yet cover with an EXACT oracle: unlike HLL its
    estimator is a pure integer function of the k-th smallest hash, so
    DuckDB re-derives it bit-for-bit. Per document source: keep the K
    smallest DISTINCT md5-LE-u64 text hashes; estimate distinct texts as
    (K-1)*2^64 // h_K (exact count when fewer than K distinct values
    were ever seen). A final '__ALL__' row is built by MERGING the
    per-source sketches — the union-mergeability that makes bottom-k
    work on a 256-node cluster (each node sketches locally; the
    coordinator merges 20×K values, never the data).

    Scale shape: per-batch per-source bottom-K combiner (≤ sources×K
    rows leave each batch) → one source-keyed exchange folds partials →
    driver holds only O(sources×K) u64s. No full-column materialization
    anywhere; the estimator arithmetic is Python-int exact on the engine
    side and HUGEINT exact in SQL."""
    from osm_export_tool_python_ray.functions.text import hash_bytes
    from osm_export_tool_python_ray.stages.exchange import grouped_map

    K = 128

    def bottomk_per_source(src, hv):
        """(source, hash) pairs → unique pairs, rank-within-source < K."""
        o = np.lexsort((hv, src))
        src_s, hv_s = src[o], hv[o]
        keep = np.ones(len(o), dtype=bool)
        keep[1:] = (src_s[1:] != src_s[:-1]) | (hv_s[1:] != hv_s[:-1])
        src_u, hv_u = src_s[keep], hv_s[keep]
        n = len(src_u)
        seg = np.ones(n, dtype=bool)
        seg[1:] = src_u[1:] != src_u[:-1]
        idx = np.arange(n, dtype=np.int64)
        start = np.maximum.accumulate(np.where(seg, idx, 0))
        m = (idx - start) < K
        return src_u[m], hv_u[m]

    def partial(t: pa.Table) -> pa.Table:
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        hv = np.array(
            [hash_bytes(x.encode("utf-8")) for x in t.column("text").to_pylist()],
            dtype=np.uint64,
        )
        s, h = bottomk_per_source(src, hv)
        # bucket on a DETERMINISTIC per-source hash (Python's str hash is
        # salted per process — it would scatter one source's sketches
        # across buckets) so the exchange co-locates each source
        bkt = np.array(
            [zlib.crc32(x.encode("utf-8")) % 32 for x in s], dtype=np.int32
        )
        return pa.table(
            {
                "source": pa.array(list(s), type=pa.string()),
                "hv": pa.array(h, type=pa.uint64()),
                "bucket": pa.array(bkt),
            }
        )

    OUT = pa.schema([("source", pa.string()), ("hv", pa.uint64())])

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return OUT.empty_table()
        src = np.asarray(g.column("source").to_pylist(), dtype=object)
        hv = g.column("hv").to_numpy(zero_copy_only=False).astype(np.uint64)
        s, h = bottomk_per_source(src, hv)
        return pa.table(
            {"source": pa.array(list(s), type=pa.string()), "hv": pa.array(h, type=pa.uint64())}
        )

    ds = _read(sf_dir, "documents", ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    sketches = grouped_map(
        ds,
        "bucket",
        fold,
        num_partitions=8,
        payload_schema=pa.schema(
            [("source", pa.string()), ("hv", pa.uint64()), ("bucket", pa.int32())]
        ),
    )

    # O(sources × K) rows — the only driver-side state
    rows = sketches.take_all()
    if not rows:  # empty corpus: the oracle's window CTEs emit 0 rows too
        return pa.table(
            {
                "source": pa.array([], type=pa.string()),
                "sketch_k": pa.array([], type=pa.int64()),
                "est_distinct": pa.array([], type=pa.int64()),
            }
        )
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(int(r["hv"]))

    def estimate(hashes):
        hs = sorted(set(hashes))[:K]
        if len(hs) < K:
            return len(hs), len(hs)
        return K, min((K - 1) * (1 << 64) // hs[K - 1], 1 << 62)

    merged = [h for hs in by_src.values() for h in hs]
    out_rows = [("__ALL__",) + estimate(merged)]
    for s in by_src:
        out_rows.append((s,) + estimate(by_src[s]))
    # codepoint sort = DuckDB's binary ORDER BY (all-ASCII source names)
    out_rows.sort(key=lambda r: r[0])
    return pa.table(
        {
            "source": pa.array([r[0] for r in out_rows], type=pa.string()),
            "sketch_k": pa.array([r[1] for r in out_rows], type=pa.int64()),
            "est_distinct": pa.array([r[2] for r in out_rows], type=pa.int64()),
        }
    )


def _build_kmv_sql(K=128):
    le = _le64_expr("md5(text)")
    est = (
        "CAST(LEAST(CAST({km1} AS HUGEINT) * CAST('18446744073709551616' AS HUGEINT)"
        " // CAST(hk AS HUGEINT), CAST('4611686018427387904' AS HUGEINT)) AS BIGINT)"
    ).format(km1=K - 1)
    return """
WITH h AS (SELECT DISTINCT source, {le} AS hv FROM documents),
u AS (SELECT DISTINCT hv FROM h),
r AS (SELECT source, hv, row_number() OVER (PARTITION BY source ORDER BY hv) AS rk,
             count(*) OVER (PARTITION BY source) AS nd FROM h),
ra AS (SELECT '__ALL__' AS source, hv, row_number() OVER (ORDER BY hv) AS rk,
              count(*) OVER () AS nd FROM u),
allr AS (SELECT * FROM r UNION ALL SELECT * FROM ra),
kth AS (SELECT source, hv AS hk FROM allr WHERE rk = {K}),
base AS (SELECT DISTINCT source, nd FROM allr)
SELECT b.source,
       CAST(LEAST(b.nd, {K}) AS BIGINT) AS sketch_k,
       CASE WHEN b.nd < {K} THEN CAST(b.nd AS BIGINT) ELSE {est} END AS est_distinct
FROM base b LEFT JOIN kth k ON b.source = k.source
ORDER BY b.source
""".format(le=le, K=K, est=est)


SQL_KMV_DISTINCT = _build_kmv_sql()


def q_chi2_terms(sf_dir):
    """Chi-square feature selection (the classic supervised term-ranking
    step before training a text classifier — complements the engine's
    naive_bayes_lang, which ASSUMES a vocabulary, by computing the
    statistic that picks one): for every term, the 2×2 chi-square of
    document-level term presence vs the binary label lang='en'; top 50
    by statistic. Presence counts are per-document DISTINCT (a document
    never spans two batches, so per-batch distinct (doc, term) pairs sum
    exactly); the contingency arithmetic is the IDENTICAL IEEE double
    expression on both sides — every operand an exact small integer —
    and the rank ORDER uses the raw statistic with a term tie-break, so
    the cut at rank 50 cannot flake. Scale shape: per-batch (term,
    n_pos, n_neg) combiner → one term groupby (vocabulary-sized, not
    token-sized) → distributed sort+limit; the only driver state is the
    final 50 rows."""
    from osm_export_tool_python_ray.functions.text import alnum_tokens_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def tot_partial(t: pa.Table) -> pa.Table:
        langs = np.asarray(t.column("lang").to_pylist(), dtype=object)
        return pa.table(
            {
                "n1": pa.array([int((langs == "en").sum())], type=pa.int64()),
                "n": pa.array([len(langs)], type=pa.int64()),
            }
        )

    tot = ds.map_batches(tot_partial, batch_format="pyarrow").sum(["n1", "n"])
    if tot is None or tot.get("sum(n)") is None:  # empty corpus
        return pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "df_pos": pa.array([], type=pa.int64()),
                "df_neg": pa.array([], type=pa.int64()),
                "chi2": pa.array([], type=pa.float64()),
            }
        )
    n1 = int(tot["sum(n1)"])
    n = int(tot["sum(n)"])
    n0 = n - n1

    def pair_partial(t: pa.Table) -> pa.Table:
        langs = np.asarray(t.column("lang").to_pylist(), dtype=object)
        flat_list, ntoks = alnum_tokens_batch(t.column("text").to_pylist())
        flat = np.asarray(flat_list, dtype=object)
        didx = np.repeat(np.arange(len(ntoks), dtype=np.int64), ntoks)
        if len(flat) == 0:
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "np_": pa.array([], type=pa.int64()),
                    "nn_": pa.array([], type=pa.int64()),
                }
            )
        o = np.lexsort((flat, didx))
        f_s, d_s = flat[o], didx[o]
        keep = np.ones(len(o), dtype=bool)
        keep[1:] = (d_s[1:] != d_s[:-1]) | (f_s[1:] != f_s[:-1])
        f_u, d_u = f_s[keep], d_s[keep]  # distinct (doc, term)
        pos = (langs[d_u] == "en").astype(np.int64)
        terms, inv = np.unique(f_u, return_inverse=True)
        npos = np.bincount(inv, weights=pos).astype(np.int64)
        ntot = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "term": pa.array(list(terms), type=pa.string()),
                "np_": pa.array(npos),
                "nn_": pa.array(ntot - npos),
            }
        )

    counts = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("term")
        .sum(["np_", "nn_"])
    )

    def score(t: pa.Table) -> pa.Table:
        a = t.column("sum(np_)").to_numpy(zero_copy_only=False)
        b = t.column("sum(nn_)").to_numpy(zero_copy_only=False)
        keep = (a + b) < n
        a, b = a[keep], b[keep]
        terms = pc.filter(t.column("term"), pa.array(keep))
        af = a.astype(np.float64)
        bf = b.astype(np.float64)
        cf = (n1 - a).astype(np.float64)
        df_ = (n0 - b).astype(np.float64)
        d2 = af * df_ - bf * cf
        num = float(n) * d2 * d2
        den = ((a + b).astype(np.float64) * (n - a - b).astype(np.float64)) * (
            float(n1) * float(n0)
        )
        return pa.table(
            {
                "term": terms,
                "df_pos": pa.array(a),
                "df_neg": pa.array(b),
                "chi2_raw": pa.array(num / den),
            }
        )

    top = (
        counts.map_batches(score, batch_format="pyarrow")
        .sort(["chi2_raw", "term"], descending=[True, False])
        .limit(50)
        .take_all()
    )
    return pa.table(
        {
            "term": pa.array([r["term"] for r in top], type=pa.string()),
            "df_pos": pa.array([r["df_pos"] for r in top], type=pa.int64()),
            "df_neg": pa.array([r["df_neg"] for r in top], type=pa.int64()),
            "chi2": pa.array(
                qround6(
                    np.array([r["chi2_raw"] for r in top], dtype=np.float64),
                    "chi2_terms",
                ),
                type=pa.float64(),
            ),
        }
    )


SQL_CHI2_TERMS = r"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS pos,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
w0 AS (SELECT doc_id, pos, unnest(t) AS term FROM toks),
w AS (SELECT DISTINCT doc_id, pos, term FROM w0),
agg AS (
  SELECT term,
         CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS df_pos,
         CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS df_neg
  FROM w GROUP BY term
),
tot AS (
  SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         count(*) AS n
  FROM documents
),
sc AS (
  SELECT term, df_pos, df_neg,
         (CAST(n AS DOUBLE)
          * (CAST(df_pos AS DOUBLE) * CAST((n - n1) - df_neg AS DOUBLE)
             - CAST(df_neg AS DOUBLE) * CAST(n1 - df_pos AS DOUBLE))
          * (CAST(df_pos AS DOUBLE) * CAST((n - n1) - df_neg AS DOUBLE)
             - CAST(df_neg AS DOUBLE) * CAST(n1 - df_pos AS DOUBLE)))
         / ((CAST(df_pos + df_neg AS DOUBLE) * CAST(n - df_pos - df_neg AS DOUBLE))
            * (CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE))) AS chi2_raw
  FROM agg, tot
  WHERE df_pos + df_neg < n
)
SELECT term, df_pos, df_neg, {QR} AS chi2
FROM sc ORDER BY chi2_raw DESC, term LIMIT 50
""".format(QR=sql_qround6("chi2_raw"))


def q_decision_stump(sf_dir):
    """Optimal 1-D decision stump (CART's inner loop, the primitive under
    every tree/GBDT trainer): the threshold on doc length (n_chars) that
    best separates lang='en' from the rest, scored by Gini purity —
    maximize (c1²+c0²)/nL + (r1²+r0²)/nR over all split points. The
    candidate set is the DISTINCT value domain (bounded by max doc
    length, not corpus size); per-value label counts come from a
    combiner-shaped groupby, the left-side cumulative counts from TWO
    ordered_prefix_scan exchanges (stages/scan.py — O(num_buckets)
    driver state each), re-joined value-to-value by one bucket_join.
    The score is the identical IEEE double expression on both sides and
    the argmax tie-breaks on threshold asc, so the winning row cannot
    flake. Returns ONE row: threshold (left = x <= t), the 2×2 split
    counts, and the rounded score."""
    from osm_export_tool_python_ray.stages.joins import bucket_join
    from osm_export_tool_python_ray.stages.scan import ordered_prefix_scan

    def partial(t: pa.Table) -> pa.Table:
        x = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = (
            np.asarray(t.column("lang").to_pylist(), dtype=object) == "en"
        ).astype(np.int64)
        xs, inv = np.unique(x, return_inverse=True)
        p1 = np.bincount(inv, weights=pos).astype(np.int64)
        n = np.bincount(inv).astype(np.int64)
        return pa.table(
            {"x": pa.array(xs), "p1": pa.array(p1), "p0": pa.array(n - p1)}
        )

    per_x = (
        _read(sf_dir, "documents", ["n_chars", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("x")
        .sum(["p1", "p0"])
        .map_batches(
            lambda t: pa.table(
                {
                    "x": t.column("x"),
                    "p1": t.column("sum(p1)"),
                    "p0": t.column("sum(p0)"),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()  # distinct-x rows, distributed; consumed 3×
    )

    t1 = int(per_x.sum("p1") or 0)
    t0 = int(per_x.sum("p0") or 0)
    n_total = t1 + t0

    s1 = ordered_prefix_scan(
        per_x.select_columns(["x", "p1"]), order_col="x", value_col="p1"
    ).map_batches(
        lambda t: pa.table(
            {
                "x": t.column("x"),
                "c1": pa.array(
                    t.column("cum_excl").to_numpy(zero_copy_only=False)
                    + t.column("p1").to_numpy(zero_copy_only=False)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    s0 = ordered_prefix_scan(
        per_x.select_columns(["x", "p0"]), order_col="x", value_col="p0"
    ).map_batches(
        lambda t: pa.table(
            {
                "x": t.column("x"),
                "c0": pa.array(
                    t.column("cum_excl").to_numpy(zero_copy_only=False)
                    + t.column("p0").to_numpy(zero_copy_only=False)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucket_join(
        s1,
        s0,
        "x",
        left_schema=pa.schema([("x", pa.int64()), ("c1", pa.int64())]),
        right_schema=pa.schema([("x", pa.int64()), ("c0", pa.int64())]),
    )

    def score(t: pa.Table) -> pa.Table:
        c1 = t.column("c1").to_numpy(zero_copy_only=False)
        c0 = t.column("c0").to_numpy(zero_copy_only=False)
        keep = (c1 + c0) < n_total  # right side must be nonempty
        c1, c0 = c1[keep], c0[keep]
        x = t.column("x").to_numpy(zero_copy_only=False)[keep]
        r1 = t1 - c1
        r0 = t0 - c0
        c1f, c0f = c1.astype(np.float64), c0.astype(np.float64)
        r1f, r0f = r1.astype(np.float64), r0.astype(np.float64)
        sc = (c1f * c1f + c0f * c0f) / (c1 + c0).astype(np.float64) + (
            r1f * r1f + r0f * r0f
        ) / (r1 + r0).astype(np.float64)
        return pa.table(
            {
                "x": pa.array(x),
                "c1": pa.array(c1),
                "c0": pa.array(c0),
                "r1": pa.array(r1),
                "r0": pa.array(r0),
                "score_raw": pa.array(sc),
            }
        )

    best = (
        joined.map_batches(score, batch_format="pyarrow")
        .sort(["score_raw", "x"], descending=[True, False])
        .limit(1)
        .take_all()
    )
    if not best:  # empty / single-value corpus: no valid split exists
        z = pa.array([], type=pa.int64())
        return pa.table(
            {
                "threshold": z,
                "n_pos_left": z,
                "n_neg_left": z,
                "n_pos_right": z,
                "n_neg_right": z,
                "score": pa.array([], type=pa.float64()),
            }
        )
    r = best[0]
    return pa.table(
        {
            "threshold": pa.array([r["x"]], type=pa.int64()),
            "n_pos_left": pa.array([r["c1"]], type=pa.int64()),
            "n_neg_left": pa.array([r["c0"]], type=pa.int64()),
            "n_pos_right": pa.array([r["r1"]], type=pa.int64()),
            "n_neg_right": pa.array([r["r0"]], type=pa.int64()),
            "score": pa.array([round(r["score_raw"], 6)], type=pa.float64()),
        }
    )


SQL_DECISION_STUMP = r"""
WITH d AS (
  SELECT CAST(n_chars AS BIGINT) AS x,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p
  FROM documents
),
g AS (
  SELECT x, CAST(sum(p) AS BIGINT) AS p1,
         CAST(count(*) - sum(p) AS BIGINT) AS p0
  FROM d GROUP BY x
),
c AS (
  SELECT x,
         CAST(sum(p1) OVER w AS BIGINT) AS c1,
         CAST(sum(p0) OVER w AS BIGINT) AS c0
  FROM g WINDOW w AS (ORDER BY x ROWS UNBOUNDED PRECEDING)
),
t AS (
  SELECT CAST(sum(p1) AS BIGINT) AS t1, CAST(sum(p0) AS BIGINT) AS t0 FROM g
),
sc AS (
  SELECT x, c1, c0, t1 - c1 AS r1, t0 - c0 AS r0,
         (CAST(c1 AS DOUBLE) * CAST(c1 AS DOUBLE)
          + CAST(c0 AS DOUBLE) * CAST(c0 AS DOUBLE))
         / CAST(c1 + c0 AS DOUBLE)
         + (CAST(t1 - c1 AS DOUBLE) * CAST(t1 - c1 AS DOUBLE)
            + CAST(t0 - c0 AS DOUBLE) * CAST(t0 - c0 AS DOUBLE))
         / CAST((t1 - c1) + (t0 - c0) AS DOUBLE) AS score_raw
  FROM c, t WHERE c1 + c0 < t1 + t0
)
SELECT x AS threshold, c1 AS n_pos_left, c0 AS n_neg_left,
       r1 AS n_pos_right, r0 AS n_neg_right,
       round(score_raw, 6) AS score
FROM sc ORDER BY score_raw DESC, x LIMIT 1
"""


def q_ewma_users(sf_dir):
    """Exponentially-weighted tail window per user (the streaming-EWMA
    recurrence, truncated at W=16 so it is exactly computable on both
    sides): over each user's events in (ts, event_id) order, the last
    event's weighted sum  Σ_{j=0..15} v_{last-j} · 2^(15-j)  with values
    quantized to integer micro-units — newest event weighs 2^15, each
    step back halves. Integer-exact: no float accumulation, no
    summation-order dependence. ONE user-keyed exchange; the fold is a
    fully vectorized segmented tail-rank (lexsort + segment-start
    subtraction), weights applied by bit shift — no per-user loop.
    Output per user: ewma_num (int64) and n_window (≤16)."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map

    W = 16
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        v = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 1_000_000.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(u),
                "tsu": pa.array(ts),
                "event_id": t.column("event_id"),
                "v": pa.array(v),
                "bucket": pa.array((u % 64).astype(np.int32)),
            }
        )

    OUT = pa.schema(
        [("user_id", pa.int64()), ("ewma_num", pa.int64()), ("n_window", pa.int64())]
    )

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("tsu").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        v = g.column("v").to_numpy(zero_copy_only=False)
        # (user asc, ts desc, event_id desc): newest event first per user
        order = np.lexsort((-eid, -ts, u))
        u, v = u[order], v[order]
        n = len(u)
        idx = np.arange(n, dtype=np.int64)
        seg = np.ones(n, dtype=bool)
        seg[1:] = u[1:] != u[:-1]
        start = np.maximum.accumulate(np.where(seg, idx, 0))
        r = idx - start  # 0 = newest event of its user
        m = r < W
        wsum = np.zeros(int(seg.sum()), dtype=np.int64)
        uid_seg = u[seg]
        seg_id = np.cumsum(seg) - 1
        np.add.at(wsum, seg_id[m], v[m] << (W - 1 - r[m]))
        nwin = np.bincount(seg_id[m], minlength=len(wsum)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid_seg),
                "ewma_num": pa.array(wsum),
                "n_window": pa.array(nwin),
            }
        )

    return grouped_map(
        ds.map_batches(keyed, batch_format="pyarrow"),
        "bucket",
        fold,
        num_partitions=8,
        payload_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("tsu", pa.int64()),
                ("event_id", pa.int64()),
                ("v", pa.int64()),
                ("bucket", pa.int32()),
            ]
        ),
    ).sort("user_id")


SQL_EWMA_USERS = r"""
WITH e AS (
  SELECT user_id,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS r
  FROM events
)
SELECT user_id,
       CAST(sum(v * (65536 >> r)) AS BIGINT) AS ewma_num,
       CAST(count(*) AS BIGINT) AS n_window
FROM e WHERE r <= 16
GROUP BY user_id ORDER BY user_id
"""


def q_benford_audit(sf_dir):
    """Benford first-significant-digit audit (the classic fraud /
    data-entry anomaly screen for financial columns): distribution of
    the leading digit of l_extendedprice, with each digit's share in
    integer parts-per-million. Prices are quantized to exact integer
    cents first (2-decimal doubles, identical floor(x*100+0.5) on both
    sides), so the leading digit is a pure integer function — the
    engine extracts it by repeated integer division, the oracle by the
    first character of the decimal string; both are the leading digit
    of the SAME integer. Map-side 9-bin bincount combiner → one tiny
    keyed fold; the only driver state is the 9-row histogram."""
    from osm_export_tool_python_ray.stages.exchange import keyed_sum

    def partial(t: pa.Table) -> pa.Table:
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * 100.0 + 0.5).astype(np.int64)
        y = cents[cents > 0]
        while len(y) and int(y.max()) >= 10:
            m = y >= 10
            y[m] //= 10
        counts = np.bincount(y, minlength=10)[1:10]
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    agg = keyed_sum(
        _read(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["digit"],
        [("n", "n")],
    )
    rows = sorted(agg.take_all(), key=lambda r: r["digit"])  # ≤ 9 rows
    tot = sum(int(r["n"]) for r in rows)
    rows = [r for r in rows if int(r["n"]) > 0]
    return pa.table(
        {
            "digit": pa.array([int(r["digit"]) for r in rows], type=pa.int64()),
            "n": pa.array([int(r["n"]) for r in rows], type=pa.int64()),
            "pct_e6": pa.array(
                [int(r["n"]) * 1_000_000 // tot for r in rows], type=pa.int64()
            ),
        }
    )


SQL_BENFORD_AUDIT = r"""
WITH c AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem
),
v AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM c WHERE cents > 0
),
g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY digit),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM g)
SELECT digit, n, CAST(n * 1000000 // tot AS BIGINT) AS pct_e6
FROM g, t ORDER BY digit
"""


def q_assoc_rules(sf_dir):
    """Association-rule mining over user event baskets (the Apriori
    support/confidence/lift report, market-basket style: "users who did
    A also did B"): baskets are each user's DISTINCT event types; rules
    are directional type pairs with support ≥ 5 users, scored by
    confidence n_ab/n_a and lift n·n_ab/(n_a·n_b), both in integer
    parts-per-million (Python-int / HUGEINT exact — no float). Scale
    shape: the type domain is small and bounded, so each user's basket
    is a BITMASK — one user-keyed exchange, a per-partition
    bitwise_or.reduceat fold, then pair counts come from ≤C(T,2)
    vectorized mask tests over the user-mask array; what leaves each
    partition is O(T²) count rows, never user rows. The only driver
    state is the T-type dictionary and the final rule table."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map

    MINSUP = 5

    # type dictionary: bounded domain, tiny take_all
    types = sorted(
        r["event_type"]
        for r in _read(sf_dir, "events", ["event_type"])
        .groupby("event_type")
        .count()
        .take_all()
    )
    T = len(types)
    if T > 64:
        raise ValueError("event_type domain %d exceeds the 64-bit basket" % T)
    tid = {t: i for i, t in enumerate(types)}

    def keyed(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        bits = np.array([np.uint64(1) << np.uint64(tid[x]) for x in et], dtype=np.uint64)
        return pa.table(
            {
                "user_id": pa.array(u),
                "bit": pa.array(bits, type=pa.uint64()),
                "bucket": pa.array((u % 64).astype(np.int32)),
            }
        )

    OUT = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("nab", pa.int64())])

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        bit = g.column("bit").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(u, kind="stable")
        u, bit = u[order], bit[order]
        seg = np.ones(len(u), dtype=bool)
        seg[1:] = u[1:] != u[:-1]
        starts = np.nonzero(seg)[0]
        masks = np.bitwise_or.reduceat(bit, starts)  # one basket per user
        a_out, b_out, n_out = [], [], []
        # per (a, b) TYPE pair — ≤ C(T,2) vectorized tests, a==b row
        # carries n_a (single-type support) at b == a
        for a in range(T):
            in_a = (masks >> np.uint64(a)) & np.uint64(1)
            a_out.append(a)
            b_out.append(a)
            n_out.append(int(in_a.sum()))
            for b in range(a + 1, T):
                both = in_a & ((masks >> np.uint64(b)) & np.uint64(1))
                n = int(both.sum())
                if n:
                    a_out.append(a)
                    b_out.append(b)
                    n_out.append(n)
        # n_users partial rides as a == b == -1
        a_out.append(-1)
        b_out.append(-1)
        n_out.append(len(masks))
        return pa.table(
            {
                "a": pa.array(np.asarray(a_out, dtype=np.int64)),
                "b": pa.array(np.asarray(b_out, dtype=np.int64)),
                "nab": pa.array(np.asarray(n_out, dtype=np.int64)),
            }
        )

    partials = grouped_map(
        _read(sf_dir, "events", ["user_id", "event_type"]).map_batches(
            keyed, batch_format="pyarrow"
        ),
        "bucket",
        fold,
        num_partitions=8,
        payload_schema=pa.schema(
            [("user_id", pa.int64()), ("bit", pa.uint64()), ("bucket", pa.int32())]
        ),
    )
    from osm_export_tool_python_ray.stages.exchange import keyed_sum

    agg = keyed_sum(partials, ["a", "b"], [("nab", "nab")])
    rows = agg.take_all()  # ≤ C(T,2)+T+1 rows
    n_users = 0
    n_a = {}
    pair = {}
    for r in rows:
        a, b, n = int(r["a"]), int(r["b"]), int(r["nab"])
        if a == -1:
            n_users = n
        elif a == b:
            n_a[a] = n
        else:
            pair[(a, b)] = n
    out = []
    for (a, b), nab in pair.items():
        if nab < MINSUP:
            continue
        for ante, cons in ((a, b), (b, a)):
            conf = nab * 1_000_000 // n_a[ante]
            lift = n_users * nab * 1_000_000 // (n_a[ante] * n_a[cons])
            out.append((types[ante], types[cons], nab, conf, lift))
    out.sort()
    return pa.table(
        {
            "ante": pa.array([r[0] for r in out], type=pa.string()),
            "cons": pa.array([r[1] for r in out], type=pa.string()),
            "nab": pa.array([r[2] for r in out], type=pa.int64()),
            "conf_e6": pa.array([r[3] for r in out], type=pa.int64()),
            "lift_e6": pa.array([r[4] for r in out], type=pa.int64()),
        }
    )


SQL_ASSOC_RULES = r"""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
na AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY event_type),
nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events),
p AS (
  SELECT a.event_type AS ante, b.event_type AS cons,
         CAST(count(*) AS BIGINT) AS nab
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type <> b.event_type
  GROUP BY 1, 2
)
SELECT p.ante, p.cons, p.nab,
       CAST(CAST(p.nab AS HUGEINT) * 1000000 // x.n AS BIGINT) AS conf_e6,
       CAST(CAST(u.n AS HUGEINT) * p.nab * 1000000
            // (CAST(x.n AS HUGEINT) * y.n) AS BIGINT) AS lift_e6
FROM p
JOIN na x ON p.ante = x.event_type
JOIN na y ON p.cons = y.event_type, nu u
WHERE p.nab >= 5
ORDER BY p.ante, p.cons
"""


# Overlapping-matcher mapping for theme_cooccurrence: default.yml's themes
# are mutually exclusive on the synthetic corpus, so the multi-label side
# of ThemeRouter (one feature → several theme rows) was previously only
# pytest-covered. These four themes overlap by construction (every named
# amenity is in both 'named' and 'amenities', etc.).
OVERLAP_MAPPING_YML = """
named:
  types: [points, lines, polygons]
  select: [name]
  where:
    - name IS NOT NULL
amenities:
  types: [points, polygons]
  select: [amenity]
  where:
    - amenity IS NOT NULL
roads:
  types: [lines]
  select: [highway]
  where:
    - highway IS NOT NULL
tall:
  types: [points, lines, polygons]
  select: [height]
  where:
    - height IS NOT NULL
"""

_OVERLAP_EXPORT_CACHE = {}


def _run_overlap_export():
    """(mapping, themed) for the overlap mapping — same memoization
    rationale as _run_default_export."""
    import ray.data

    from osm_export_tool_python_ray.mapping import Mapping
    from osm_export_tool_python_ray.pipelines.export import run_export

    path = corpus_path(n_shards=4)
    if path not in _OVERLAP_EXPORT_CACHE:
        mapping = Mapping(OVERLAP_MAPPING_YML)
        themed = run_export(
            ray.data.read_parquet(path), mapping, num_partitions=4, num_buckets=16
        ).materialize()
        _OVERLAP_EXPORT_CACHE[path] = (mapping, themed)
    return _OVERLAP_EXPORT_CACHE[path]


def q_theme_cooccurrence(sf_dir):
    """Theme co-occurrence over the flagship export surface: for every
    pair of themes, how many features were routed to BOTH (per geometry
    type) — the audit a mapping author runs to find redundant or
    shadowed matchers. Exercises ThemeRouter's multi-label path (one
    feature → several theme rows) under an overlapping-matcher mapping.
    Scale shape: themes are a bounded domain, so each feature's theme
    set is a BITMASK — per-partition bitwise_or.reduceat over one
    feature-keyed exchange, then ≤3·C(T,2) vectorized mask tests emit
    count partials; one tiny keyed fold finishes. No pair explosion of
    feature rows, no driver state beyond the T-theme dictionary.
    Oracle: export_oracle.sql_theme_cooccurrence re-derives both the
    export surface and the pair counts in SQL."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map, keyed_sum

    mapping, themed = _run_overlap_export()
    names = [t.name for t in mapping.themes]
    tix = {nm: i for i, nm in enumerate(names)}
    T = len(names)

    def keyed(t: pa.Table) -> pa.Table:
        osm = t.column("osm_id").to_numpy(zero_copy_only=False).astype(np.int64)
        gt = t.column("geom_type").to_numpy(zero_copy_only=False).astype(np.int64)
        th = np.asarray(t.column("theme").to_pylist(), dtype=object)
        bit = np.array(
            [np.uint64(1) << np.uint64(tix[x]) for x in th], dtype=np.uint64
        )
        key = osm * 8 + gt  # geom_type ∈ 1..3 rides the low bits, sign-safe
        return pa.table(
            {
                "key": pa.array(key),
                "bit": pa.array(bit, type=pa.uint64()),
                "bucket": pa.array((key % 32).astype(np.int32)),
            }
        )

    OUT = pa.schema(
        [("ta", pa.int64()), ("tb", pa.int64()), ("gt", pa.int64()), ("n", pa.int64())]
    )

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return OUT.empty_table()
        key = g.column("key").to_numpy(zero_copy_only=False)
        bit = g.column("bit").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(key, kind="stable")
        key, bit = key[order], bit[order]
        seg = np.ones(len(key), dtype=bool)
        seg[1:] = key[1:] != key[:-1]
        starts = np.nonzero(seg)[0]
        masks = np.bitwise_or.reduceat(bit, starts)
        gts = key[seg] % 8
        ta, tb, gg, nn = [], [], [], []
        for gval in (1, 2, 3):
            mg = masks[gts == gval]
            if not len(mg):
                continue
            for a in range(T):
                in_a = (mg >> np.uint64(a)) & np.uint64(1)
                for b in range(a + 1, T):
                    n = int((in_a & ((mg >> np.uint64(b)) & np.uint64(1))).sum())
                    if n:
                        ta.append(a)
                        tb.append(b)
                        gg.append(gval)
                        nn.append(n)
        return pa.table(
            {
                "ta": pa.array(np.asarray(ta, dtype=np.int64)),
                "tb": pa.array(np.asarray(tb, dtype=np.int64)),
                "gt": pa.array(np.asarray(gg, dtype=np.int64)),
                "n": pa.array(np.asarray(nn, dtype=np.int64)),
            }
        )

    partials = grouped_map(
        themed.map_batches(keyed, batch_format="pyarrow"),
        "bucket",
        fold,
        num_partitions=4,
        payload_schema=pa.schema(
            [("key", pa.int64()), ("bit", pa.uint64()), ("bucket", pa.int32())]
        ),
    )
    rows = keyed_sum(partials, ["ta", "tb", "gt"], [("n", "n")]).take_all()
    # pair order is LEXICOGRAPHIC on theme names (the oracle's
    # a.theme < b.theme), not mapping-index order
    out = sorted(
        tuple(sorted((names[int(r["ta"])], names[int(r["tb"])])))
        + (int(r["gt"]), int(r["n"]))
        for r in rows
    )
    return pa.table(
        {
            "theme_a": pa.array([r[0] for r in out], type=pa.string()),
            "theme_b": pa.array([r[1] for r in out], type=pa.string()),
            "geom_type": pa.array([r[2] for r in out], type=pa.int64()),
            "n": pa.array([r[3] for r in out], type=pa.int64()),
        }
    )


def q_layer_fill_rates(sf_dir):
    """Selected-column fill rates per exported layer: for every theme and
    every key its mapping `select:`s, how many routed feature rows carry
    that tag — the audit that finds dead select entries and sparse layer
    columns before anyone opens the .gpkg. Runs over the SAME themed
    surface the sinks consume (tags ride the feature rows — no re-join,
    no second corpus pass); per-batch presence comes from the Arrow-native
    extract_tag_columns kernel, partials are (theme, col, n, n_present)
    rows, and the groupby folds ≤ themes×keys rows. Oracle:
    export_oracle.sql_layer_fill_rates re-extracts tag presence from the
    raw element JSON per (theme, col) — nothing shared with
    ThemeProjector."""
    from osm_export_tool_python_ray.stages.matcher_eval import extract_tag_columns

    mapping, themed = _run_default_export()
    keys_by_theme = {t.name: sorted(t.keys) for t in mapping.themes}

    def partial(t: pa.Table) -> pa.Table:
        th = np.asarray(t.column("theme").to_pylist(), dtype=object)
        out_theme, out_col, out_n, out_p = [], [], [], []
        for name, keys in keys_by_theme.items():
            mrows = np.nonzero(th == name)[0]
            if not len(mrows):
                continue
            sub = t.take(pa.array(mrows)).column("tags")
            cols = extract_tag_columns(sub, keys)
            for k in keys:
                pres, _vals = cols[k]
                out_theme.append(name)
                out_col.append(k)
                out_n.append(len(mrows))
                out_p.append(int(pres.sum()))
        return pa.table(
            {
                "theme": pa.array(out_theme, type=pa.string()),
                "col": pa.array(out_col, type=pa.string()),
                "n": pa.array(np.asarray(out_n, dtype=np.int64)),
                "n_present": pa.array(np.asarray(out_p, dtype=np.int64)),
            }
        )

    rows = (
        themed.map_batches(partial, batch_format="pyarrow")
        .groupby(["theme", "col"])
        .sum(["n", "n_present"])
        .take_all()
    )  # ≤ themes × keys rows
    out = sorted(
        (r["theme"], r["col"], int(r["sum(n)"]), int(r["sum(n_present)"]))
        for r in rows
    )
    return pa.table(
        {
            "theme": pa.array([r[0] for r in out], type=pa.string()),
            "col": pa.array([r[1] for r in out], type=pa.string()),
            "n": pa.array([r[2] for r in out], type=pa.int64()),
            "n_present": pa.array([r[3] for r in out], type=pa.int64()),
        }
    )


QUERIES = {
    "exact_dedup": q_exact_dedup,
    "doc_stats": q_doc_stats,
    "token_budget": q_token_budget,
    "doc_fingerprint": q_doc_fingerprint,
    "winnow_fingerprints": q_winnow_fingerprints,
    "quality_score": q_quality_score,
    "repetition_quality": q_repetition_quality,
    "vocab_topk": q_vocab_topk,
    "decontaminate": q_decontaminate,
    "pii_redact": q_pii_redact,
    "hash_sample": q_hash_sample,
    "lang_counts": q_lang_counts,
    "char_quantiles": q_char_quantiles,
    "top_docs": q_top_docs,
    "pack_assignment": q_pack_assignment,
    "unigram_logprob": q_unigram_logprob,
    "stratified_sample": q_stratified_sample,
    "theme_filter": q_theme_filter,
    "lang_id": q_lang_id,
    "naive_bayes_lang": q_naive_bayes_lang,
    "minhash_pairs": q_minhash_pairs,
    "simhash_pairs": q_simhash_pairs,
    "ngram_jaccard": q_ngram_jaccard,
    "tfidf_cosine_pairs": q_tfidf_cosine_pairs,
    "kcore": q_kcore,
    "snm_pairs": q_snm_pairs,
    "graph_walks": q_graph_walks,
    "entity_clusters": q_entity_clusters,
    "dedup_clusters": q_dedup_clusters,
    "ngram_clusters": q_ngram_clusters,
    "dup_spans": q_dup_spans,
    "source_overlap": q_source_overlap,
    "hll_distinct": q_hll_distinct,
    "cms_counts": q_cms_counts,
    "bm25_topk": q_bm25_topk,
    "funnel": q_funnel,
    "trajectory": q_trajectory,
    "vocab_growth": q_vocab_growth,
    "pmi_top": q_pmi_top,
    "spatial_anti_join": q_spatial_anti_join,
    "trajectory_simplify": q_trajectory_simplify,
    "cell_density": q_cell_density,
    "grid_clusters": q_grid_clusters,
    "move_octants": q_move_octants,
    "user_hulls": q_user_hulls,
    "trajectory_geometry": q_trajectory_geometry,
    "od_matrix": q_od_matrix,
    "grid_distance": q_grid_distance,
    "stay_points": q_stay_points,
    "encounters": q_encounters,
    "convoys": q_convoys,
    "segment_crossings": q_segment_crossings,
    "session_overlap": q_session_overlap,
    "interval_coverage": q_interval_coverage,
    "rect_union": q_rect_union,
    "gap_fill": q_gap_fill,
    "table_profile": q_table_profile,
    "table_checksum": q_table_checksum,
    "postings": q_postings,
    "time_travel": q_time_travel,
    "butterflies": q_butterflies,
    "compact_cover": q_compact_cover,
    "geofence_dwell": q_geofence_dwell,
    "cusum_bursts": q_cusum_bursts,
    "reciprocal_partners": q_reciprocal_partners,
    "cell_trends": q_cell_trends,
    "sliding_distinct": q_sliding_distinct,
    "session_bigrams": q_session_bigrams,
    "attribution": q_attribution,
    "activity_histogram": q_activity_histogram,
    "user_pagerank": q_user_pagerank,
    "group_mode": q_group_mode,
    "type_entropy": q_type_entropy,
    "weighted_sample": q_weighted_sample,
    "user_paths": q_user_paths,
    "hour_pivot": q_hour_pivot,
    "lang_mad": q_lang_mad,
    "embedding_coverage": q_embedding_coverage,
    "monthly_rollup": q_monthly_rollup,
    "gap_histogram": q_gap_histogram,
    "watermark_late": q_watermark_late,
    "local_supplier_volume": q_local_supplier_volume,
    "kmv_distinct": q_kmv_distinct,
    "chi2_terms": q_chi2_terms,
    "decision_stump": q_decision_stump,
    "ewma_users": q_ewma_users,
    "benford_audit": q_benford_audit,
    "assoc_rules": q_assoc_rules,
    "theme_cooccurrence": q_theme_cooccurrence,
    "layer_fill_rates": q_layer_fill_rates,
    "audio_features": q_audio_features,
    "ann_recall_eval": q_ann_recall_eval,
    "l_diversity": q_l_diversity,
    "acf_lag1": q_acf_lag1,
    "minhash_eval": q_minhash_eval,
    "link_scores": q_link_scores,
    "theme_polygon_area": q_theme_polygon_area,
    "theme_line_length": q_theme_line_length,
    "trending": q_trending,
    "order_recon": q_order_recon,
    "conversion_latency": q_conversion_latency,
    "bounce_rate": q_bounce_rate,
    "drift_chi2": q_drift_chi2,
    "length_outliers": q_length_outliers,
    "k_anonymity": q_k_anonymity,
    "source_dup_rate": q_source_dup_rate,
    "dedup_best": q_dedup_best,
    "fd_check": q_fd_check,
    "cube_rollup": q_cube_rollup,
    "skyline": q_skyline,
    "editdist_pairs": q_editdist_pairs,
    "group_ntile": q_group_ntile,
    "neardup_degree": q_neardup_degree,
    "tag_cooccurrence": q_tag_cooccurrence,
    "spatial_autocorr": q_spatial_autocorr,
    "zorder_range": q_zorder_range,
    "map_match": q_map_match,
    "shard_assign": q_shard_assign,
    "cell_peak_hour": q_cell_peak_hour,
    "media_near_dup": q_media_near_dup,
    "aoi_cell_cover": q_aoi_cell_cover,
    "triangles": q_triangles,
    "hilbert_range": q_hilbert_range,
    "grid_dijkstra": q_grid_dijkstra,
    "cohort_retention": q_cohort_retention,
    "idw_grid": q_idw_grid,
    "hausdorff_pairs": q_hausdorff_pairs,
    "decayed_cells": q_decayed_cells,
    "span_adjacency": q_span_adjacency,
    "training_kept_docs": q_training_kept_docs,
    "bloom_incremental": q_bloom_incremental,
    "textrank_keywords": q_textrank_keywords,
    "ann_topk": q_ann_topk,
    "embedding_near_dup": q_embedding_near_dup,
    "ivf_topk": q_ivf_topk,
    "embedding_kmeans": q_embedding_kmeans,
    "gram_matrix": q_gram_matrix,
    "pq_codes": q_pq_codes,
    "pq_topk": q_pq_topk,
    "q1_lineitem": q_q1_lineitem,
    "top_orders": q_top_orders,
    "customer_orders_join": q_customer_orders_join,
    "supplier_nation_region": q_supplier_nation_region,
    "part_stats": q_part_stats,
    "events_window": q_events_window,
    "events_sliding": q_events_sliding,
    "events_sessions": q_events_sessions,
    "scd2": q_scd2,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "cdc_merge": q_cdc_merge,
    "cell_counts": q_cell_counts,
    "cell_pyramid": q_cell_pyramid,
    "tile_counts": q_tile_counts,
    "knn": q_knn,
    "pbf_element_stats": q_pbf_element_stats,
    "pbf_export_theme_counts": q_pbf_export_theme_counts,
    "export_theme_counts": q_export_theme_counts,
    "tile_assignment": q_tile_assignment,
    "tile_theme_counts": q_tile_theme_counts,
    "spatial_join": q_spatial_join,
    "aoi_extract": q_aoi_extract,
    "media_features": q_media_features,
    "gpkg_layer_counts": q_gpkg_layer_counts,
    "shp_layer_counts": q_shp_layer_counts,
    "kml_layer_counts": q_kml_layer_counts,
    "geojson_layer_counts": q_geojson_layer_counts,
}

# queries whose oracle SQL is GENERATED over the cached corpus (not a
# static constant in ORACLES) — introspection surface for oracle_sql()
# consumers and the COVERAGE.md generator
EXPORT_SURFACE_ORACLE_KEYS = (
    "pbf_element_stats",
    "pbf_export_theme_counts",
    "export_theme_counts",
    "tile_assignment",
    "tile_theme_counts",
    "spatial_join",
    "aoi_extract",
    "gpkg_layer_counts",
    "shp_layer_counts",
    "kml_layer_counts",
    "geojson_layer_counts",
    "span_adjacency",
    "tag_cooccurrence",
    "theme_cooccurrence",
    "layer_fill_rates",
    "theme_polygon_area",
    "theme_line_length",
)


def export_surface_oracles():
    """Generated DuckDB SQL for the export surface (export_theme_counts /
    tile_assignment / aoi_extract): built from the same default.yml mapping
    the Ray queries use, over the same cached corpus parquet (generated
    here if missing so the SQL is self-sufficient regardless of whether the
    driver runs the Ray side first)."""
    from osm_export_tool_python_ray.mapping import Mapping
    from osm_export_tool_python_ray.pipelines.export_oracle import (
        sql_aoi_extract,
        sql_pbf_element_stats,
        sql_export_theme_counts,
        sql_geojson_layer_counts,
        sql_gpkg_layer_counts,
        sql_kml_layer_counts,
        sql_layer_fill_rates,
        sql_shp_layer_counts,
        sql_spatial_join,
        sql_theme_cooccurrence,
        sql_tile_assignment,
        sql_tile_theme_counts,
    )

    path = corpus_path(n_shards=4)
    with open(os.path.join(os.path.dirname(__file__), "..", "mappings", "default.yml")) as f:
        mapping = Mapping(f.read())
    out = {
        "pbf_element_stats": sql_pbf_element_stats(path),
        # identical oracle for the pbf-ingested export — equality proves
        # the binary path lost/altered nothing
        "pbf_export_theme_counts": sql_export_theme_counts(path, mapping),
        "export_theme_counts": sql_export_theme_counts(path, mapping),
        "tile_assignment": sql_tile_assignment(path, mapping, zoom=12),
        "tile_theme_counts": sql_tile_theme_counts(path, mapping, zoom=12),
        "spatial_join": sql_spatial_join(path, mapping),
        "aoi_extract": sql_aoi_extract(path, mapping),
        "gpkg_layer_counts": sql_gpkg_layer_counts(path, mapping),
        "shp_layer_counts": sql_shp_layer_counts(path, mapping),
        "kml_layer_counts": sql_kml_layer_counts(path, mapping),
        "geojson_layer_counts": sql_geojson_layer_counts(path, mapping),
        "span_adjacency": sql_span_adjacency(path),
        "tag_cooccurrence": _sql_tag_cooccurrence(),
        "theme_cooccurrence": sql_theme_cooccurrence(path, Mapping(OVERLAP_MAPPING_YML)),
        "layer_fill_rates": sql_layer_fill_rates(path, mapping),
        "theme_polygon_area": _build_theme_polygon_area_sql(),
        "theme_line_length": _build_theme_line_length_sql(),
    }
    assert set(out) == set(EXPORT_SURFACE_ORACLE_KEYS)
    return out


SQL_BLOOM_INCREMENTAL = _build_bloom_sql()
SQL_HLL_DISTINCT = _build_hll_sql()
SQL_CMS_COUNTS = _build_cms_sql()
SQL_BM25_TOPK = _build_bm25_sql()


ORACLES = {
    "media_features": SQL_MEDIA_FEATURES,
    "exact_dedup": SQL_EXACT_DEDUP,
    "bloom_incremental": SQL_BLOOM_INCREMENTAL,
    "textrank_keywords": SQL_TEXTRANK_KEYWORDS,
    "doc_stats": SQL_DOC_STATS,
    "token_budget": SQL_TOKEN_BUDGET,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "winnow_fingerprints": SQL_WINNOW_FINGERPRINTS,
    "quality_score": SQL_QUALITY_SCORE,
    "repetition_quality": SQL_REPETITION_QUALITY,
    "vocab_topk": SQL_VOCAB_TOPK,
    "decontaminate": SQL_DECONTAMINATE,
    "pii_redact": SQL_PII_REDACT,
    "hash_sample": SQL_HASH_SAMPLE,
    "lang_counts": SQL_LANG_COUNTS,
    "char_quantiles": SQL_CHAR_QUANTILES,
    "top_docs": SQL_TOP_DOCS,
    "pack_assignment": SQL_PACK_ASSIGNMENT,
    "unigram_logprob": SQL_UNIGRAM_LOGPROB,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "theme_filter": SQL_THEME_FILTER,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "tfidf_cosine_pairs": SQL_TFIDF_COSINE_PAIRS,
    "kcore": SQL_KCORE,
    "snm_pairs": SQL_SNM_PAIRS,
    "graph_walks": SQL_GRAPH_WALKS,
    "entity_clusters": SQL_ENTITY_CLUSTERS,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
    "minhash_pairs": SQL_MINHASH_PAIRS,
    "lang_id": SQL_LANG_ID,
    "naive_bayes_lang": SQL_NAIVE_BAYES_LANG,
    "embedding_near_dup": SQL_EMBEDDING_NEAR_DUP,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "ngram_clusters": SQL_NGRAM_CLUSTERS,
    "dup_spans": SQL_DUP_SPANS,
    "source_overlap": SQL_SOURCE_OVERLAP,
    "hll_distinct": SQL_HLL_DISTINCT,
    "cms_counts": SQL_CMS_COUNTS,
    "bm25_topk": SQL_BM25_TOPK,
    "funnel": SQL_FUNNEL,
    "trajectory": SQL_TRAJECTORY,
    "vocab_growth": SQL_VOCAB_GROWTH,
    "pmi_top": SQL_PMI_TOP,
    "spatial_anti_join": SQL_SPATIAL_ANTI_JOIN,
    "trajectory_simplify": SQL_TRAJECTORY_SIMPLIFY,
    "cell_density": SQL_CELL_DENSITY,
    "grid_clusters": SQL_GRID_CLUSTERS,
    "move_octants": SQL_MOVE_OCTANTS,
    "user_hulls": SQL_USER_HULLS,
    "trajectory_geometry": SQL_TRAJECTORY_GEOMETRY,
    "od_matrix": SQL_OD_MATRIX,
    "grid_distance": SQL_GRID_DISTANCE,
    "stay_points": SQL_STAY_POINTS,
    "encounters": SQL_ENCOUNTERS,
    "convoys": SQL_CONVOYS,
    "segment_crossings": SQL_SEGMENT_CROSSINGS,
    "session_overlap": SQL_SESSION_OVERLAP,
    "interval_coverage": SQL_INTERVAL_COVERAGE,
    "rect_union": SQL_RECT_UNION,
    "gap_fill": SQL_GAP_FILL,
    "table_profile": SQL_TABLE_PROFILE,
    "table_checksum": SQL_TABLE_CHECKSUM,
    "postings": SQL_POSTINGS,
    "time_travel": SQL_TIME_TRAVEL,
    "butterflies": SQL_BUTTERFLIES,
    "compact_cover": SQL_COMPACT_COVER,
    "geofence_dwell": SQL_GEOFENCE_DWELL,
    "cusum_bursts": SQL_CUSUM_BURSTS,
    "reciprocal_partners": SQL_RECIPROCAL_PARTNERS,
    "cell_trends": SQL_CELL_TRENDS,
    "sliding_distinct": SQL_SLIDING_DISTINCT,
    "session_bigrams": SQL_SESSION_BIGRAMS,
    "attribution": SQL_ATTRIBUTION,
    "activity_histogram": SQL_ACTIVITY_HISTOGRAM,
    "user_pagerank": SQL_USER_PAGERANK,
    "group_mode": SQL_GROUP_MODE,
    "type_entropy": SQL_TYPE_ENTROPY,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "user_paths": SQL_USER_PATHS,
    "hour_pivot": SQL_HOUR_PIVOT,
    "lang_mad": SQL_LANG_MAD,
    "embedding_coverage": SQL_EMBEDDING_COVERAGE,
    "monthly_rollup": SQL_MONTHLY_ROLLUP,
    "gap_histogram": SQL_GAP_HISTOGRAM,
    "watermark_late": SQL_WATERMARK_LATE,
    "local_supplier_volume": SQL_LOCAL_SUPPLIER_VOLUME,
    "kmv_distinct": SQL_KMV_DISTINCT,
    "chi2_terms": SQL_CHI2_TERMS,
    "decision_stump": SQL_DECISION_STUMP,
    "ewma_users": SQL_EWMA_USERS,
    "benford_audit": SQL_BENFORD_AUDIT,
    "assoc_rules": SQL_ASSOC_RULES,
    "audio_features": SQL_AUDIO_FEATURES,
    "ann_recall_eval": SQL_ANN_RECALL_EVAL,
    "l_diversity": SQL_L_DIVERSITY,
    "acf_lag1": SQL_ACF_LAG1,
    "minhash_eval": SQL_MINHASH_EVAL,
    "link_scores": SQL_LINK_SCORES,
    "trending": SQL_TRENDING,
    "order_recon": SQL_ORDER_RECON,
    "conversion_latency": SQL_CONVERSION_LATENCY,
    "bounce_rate": SQL_BOUNCE_RATE,
    "drift_chi2": SQL_DRIFT_CHI2,
    "length_outliers": SQL_LENGTH_OUTLIERS,
    "k_anonymity": SQL_K_ANONYMITY,
    "source_dup_rate": SQL_SOURCE_DUP_RATE,
    "dedup_best": SQL_DEDUP_BEST,
    "fd_check": SQL_FD_CHECK,
    "cube_rollup": SQL_CUBE_ROLLUP,
    "skyline": SQL_SKYLINE,
    "editdist_pairs": SQL_EDITDIST_PAIRS,
    "group_ntile": SQL_GROUP_NTILE,
    "neardup_degree": SQL_NEARDUP_DEGREE,
    "spatial_autocorr": SQL_SPATIAL_AUTOCORR,
    "zorder_range": SQL_ZORDER_RANGE,
    "map_match": SQL_MAP_MATCH,
    "shard_assign": SQL_SHARD_ASSIGN,
    "cell_peak_hour": SQL_CELL_PEAK_HOUR,
    "media_near_dup": SQL_MEDIA_NEAR_DUP,
    "aoi_cell_cover": SQL_AOI_CELL_COVER,
    "triangles": SQL_TRIANGLES,
    "hilbert_range": SQL_HILBERT_RANGE,
    "grid_dijkstra": SQL_GRID_DIJKSTRA,
    "cohort_retention": SQL_COHORT_RETENTION,
    "idw_grid": SQL_IDW_GRID,
    "hausdorff_pairs": SQL_HAUSDORFF_PAIRS,
    "decayed_cells": SQL_DECAYED_CELLS,
    "training_kept_docs": SQL_TRAINING_KEPT_DOCS,
    "ann_topk": SQL_ANN_TOPK,
    "ivf_topk": SQL_IVF_TOPK,
    "embedding_kmeans": SQL_EMBEDDING_KMEANS,
    "gram_matrix": SQL_GRAM_MATRIX,
    "pq_codes": SQL_PQ_CODES,
    "pq_topk": SQL_PQ_TOPK,
    "q1_lineitem": SQL_Q1_LINEITEM,
    "top_orders": SQL_TOP_ORDERS,
    "customer_orders_join": SQL_CUSTOMER_ORDERS_JOIN,
    "supplier_nation_region": SQL_SUPPLIER_NATION_REGION,
    "part_stats": SQL_PART_STATS,
    "events_window": SQL_EVENTS_WINDOW,
    "events_sliding": SQL_EVENTS_SLIDING,
    "events_sessions": SQL_EVENTS_SESSIONS,
    "scd2": SQL_SCD2,
    "asof_join": SQL_ASOF_JOIN,
    "range_join": SQL_RANGE_JOIN,
    "cdc_merge": SQL_CDC_MERGE,
    "cell_counts": SQL_CELL_COUNTS,
    "cell_pyramid": SQL_CELL_PYRAMID,
    "tile_counts": SQL_TILE_COUNTS,
    "knn": SQL_KNN,
}
