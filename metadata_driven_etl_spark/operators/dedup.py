"""Deduplication operators for training-data pipelines (extended surface).

The reference's only dedup is the broken row_number uniqueness rule
(dq_engine.py:231-241, SURVEY.md §2.14#1). This module adds the full
large-corpus dedup toolbox: exact (hash group-by), MinHash+LSH banding,
SimHash bucketing, and n-gram Jaccard verification.

Scale design: every op is explode → hash → groupBy/self-join on hash — the
shuffles are on short hash keys, never on document bodies; LSH banding keeps
the candidate-pair join sparse (only docs sharing a band bucket meet). All
hashing is md5-based (not xxhash64) so the DuckDB oracle computes identical
values — the cost difference is irrelevant next to the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metadata_driven_etl_spark.operators.text import (
    norm_text,
    sql_norm_text,
    sql_tokens,
    tokens,
)

# --- exact dedup ------------------------------------------------------------


def exact_dedup_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by content fingerprint; keep min-id survivor + duplicate count."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).cast("long").alias("dup_count"),
        )
    )


def sql_exact_dedup_stats(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    return f"""
    SELECT md5({text_col}) AS content_hash,
           min({id_col}) AS survivor_id,
           CAST(count(*) AS BIGINT) AS dup_count
    FROM {table} GROUP BY 1
    """


def exact_dedup(df: DataFrame, subset: list[str]) -> DataFrame:
    """Plain exact dedup on a column subset (hash group-by under the hood)."""
    return df.dropDuplicates(subset)


# --- word shingles ----------------------------------------------------------


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles of the normalized text (distinct)."""
    toks = tokens(col)
    return F.array_distinct(
        F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        )
    )


def sql_shingles(expr: str, n: int = 3) -> str:
    toks = sql_tokens(expr)
    return (
        f"list_distinct(CASE WHEN len({toks}) < {n} THEN []::VARCHAR[] "
        f"ELSE list_transform(generate_series(1, len({toks}) - {n - 1}), "
        f"i -> array_to_string(({toks})[i:i+{n - 1}], ' ')) END)"
    )


# --- MinHash + LSH ----------------------------------------------------------
# Signature: k md5-based min-hashes (seed-salted). Banding: group the
# signature into bands of r values; docs sharing any band bucket are
# candidate near-dups. Classic Broder/LSH — deterministic, oracle-checkable.


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) — min over shingles of md5(seed || shingle).

    One explode + one groupBy (single shuffle on id); the k mins are
    computed as k aggregates in the same pass.
    """
    sh = df.select(F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("sh"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{i}|"), F.col("sh")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def sql_minhash_signature(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> str:
    mins = ", ".join(
        f"min(md5('s{i}|' || sh)) AS mh_{i}" for i in range(num_hashes)
    )
    return f"""
    SELECT {id_col}, {mins}
    FROM (SELECT {id_col}, unnest({sql_shingles(text_col, shingle_n)}) AS sh
          FROM {table})
    GROUP BY {id_col}
    """


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band bucket.

    Self-join is on (band_index, band_hash) — a short uniform key, so the
    join is sparse and broadcastable per bucket; no O(n²) pair blow-up.
    """
    sig = minhash_signature(df, text_col, id_col, num_hashes, shingle_n)
    n_bands = num_hashes // band_size
    bands = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"mh_{b * band_size + r}")
                                    for r in range(band_size)
                                ],
                            )
                        ).alias("bhash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bhash")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col(f"a.bhash") == F.col(f"b.bhash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def sql_lsh_candidate_pairs(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> str:
    n_bands = num_hashes // band_size
    band_rows = " UNION ALL ".join(
        f"SELECT {id_col}, {b} AS band, md5("
        + " || '|' || ".join(f"mh_{b * band_size + r}" for r in range(band_size))
        + f") AS bhash FROM sig"
        for b in range(n_bands)
    )
    return f"""
    WITH sig AS ({sql_minhash_signature(table, text_col, id_col, num_hashes, shingle_n)}),
    bands AS ({band_rows})
    SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bhash = b.bhash AND a.{id_col} < b.{id_col}
    """


# --- n-gram Jaccard ---------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard similarity over shingle sets for pairs sharing ≥1
    shingle; keeps pairs ≥ threshold.

    Sparse by construction: pairs only meet through a shared shingle
    (explode + join on shingle hash), never a cross join. Jaccard is
    computed from exact intersection/size counts → integer arithmetic,
    oracle-identical.
    """
    sh = df.select(
        F.col(id_col),
        F.explode(shingles(text_col, shingle_n)).alias("sh"),
    ).select(F.col(id_col), F.md5(F.col("sh")).alias("shh"))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shh") == F.col("b.shh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a")
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b")
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def sql_ngram_jaccard_pairs(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> str:
    return f"""
    WITH sh AS (SELECT {id_col}, md5(unnest({sql_shingles(text_col, shingle_n)})) AS shh
                FROM {table}),
    sizes AS (SELECT {id_col}, count(*) AS sz FROM sh GROUP BY 1),
    inter AS (SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, count(*) AS inter
              FROM sh a JOIN sh b ON a.shh = b.shh AND a.{id_col} < b.{id_col}
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.{id_col} = id_a
    JOIN sizes sb ON sb.{id_col} = id_b
    WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= {threshold}
    """


# --- SimHash ----------------------------------------------------------------
# 16-bit md5-based SimHash: per distinct token, md5 → 16 bits (first 4 hex
# nibbles); each bit votes ±1; sign of the vote sum is the bit. Docs sharing
# the exact simhash value bucket together. 16 bits is deliberate: it keeps
# the bit expressions enumerable in both engines (oracle-checkable) while
# demonstrating the real algorithm; widen num_bits for production use.


def _nibble_val(hash_col: Column, j: int) -> Column:
    """Value 0-15 of hex nibble j (0-based) of an md5 hex string."""
    return F.instr(
        F.lit("0123456789abcdef"), F.substring(hash_col, j + 1, 1)
    ) - F.lit(1)


def simhash(col: Column | str, num_bits: int = 16) -> Column:
    """SimHash over distinct tokens, as a long (bit b set iff vote sum ≥ 0)."""
    toks = F.array_distinct(tokens(col))
    bit_cols = []
    for b in range(num_bits):
        j, k = divmod(b, 4)  # nibble index, bit-within-nibble (msb-first)

        def vote(t: Column, b: int = b, j: int = j, k: int = k) -> Column:
            nib = _nibble_val(F.md5(t), j)
            bit = F.shiftright(nib, 3 - k).bitwiseAND(F.lit(1))
            return bit * 2 - 1  # ±1 vote

        vote_sum = F.aggregate(
            toks, F.lit(0), lambda acc, t: acc + vote(t)
        )
        bit_cols.append(
            F.when(vote_sum >= 0, F.lit(2**b).cast("long")).otherwise(F.lit(0))
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out.cast("long")


def sql_simhash(expr: str, num_bits: int = 16) -> str:
    toks = f"list_distinct({sql_tokens(expr)})"
    terms = []
    for b in range(num_bits):
        j, k = divmod(b, 4)
        nib = f"(strpos('0123456789abcdef', substr(md5(t), {j + 1}, 1)) - 1)"
        bit = f"(({nib} // {2 ** (3 - k)}) % 2)"
        vote_sum = f"list_sum(list_transform({toks}, t -> {bit} * 2 - 1))"
        terms.append(f"(CASE WHEN {vote_sum} >= 0 THEN {2**b} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def simhash_buckets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bucket stats by simhash value — collision buckets are near-dup sets."""
    return (
        df.select(simhash(text_col).alias("simhash"), F.col(id_col))
        .groupBy("simhash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("bucket_size"),
            F.min(id_col).alias("min_id"),
        )
    )


def sql_simhash_buckets(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    return f"""
    SELECT {sql_simhash(text_col)} AS simhash,
           CAST(count(*) AS BIGINT) AS bucket_size,
           min({id_col}) AS min_id
    FROM {table} GROUP BY 1
    """
