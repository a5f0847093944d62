"""ANN via random-hyperplane LSH — the 100 TB path for embedding near-dup
detection and similarity search (promised at queries/vector.py:12 in r1;
VERDICT r1 item 6).

Scheme (standard SimHash-for-cosine, Charikar 2002):
- N_PLANES pseudo-random hyperplanes in R^dim, entries derived from
  md5(plane|dim) so every engine regenerates the identical planes;
- sign bit per plane = sign of <embedding, plane>;
- bits packed into N_BANDS bands of BAND_BITS; two vectors are CANDIDATES
  iff they agree on at least one full band (equality join on the band
  bucket — the shuffle key is the bucket, never all-pairs);
- candidates are verified with the exact cosine.

Exactness contract: the projection uses INTEGER arithmetic end to end —
embeddings quantized to 1e-6 via portable half-up (floor(x*1e6 + 0.5)),
plane entries are integers in [-1000, 1000] — so the sign is a pure
integer comparison, bit-identical in Spark and DuckDB regardless of
summation order. (A float dot product near zero could flip a bit between
engines and silently change the candidate set.)

At 100 TB: the signature stage is map-only (one pass over vectors); bucket
join fan-out is controlled by band width (8 bits ⇒ 256 buckets per band
within each cohort of similar vectors); skewed buckets (dense clusters)
are handled by AQE skew-join splitting, or by raising BAND_BITS.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PLANES = 24
BAND_BITS = 8
N_BANDS = N_PLANES // BAND_BITS
QUANT = 1_000_000


def _plane_entry(p: int, d: int) -> int:
    """Deterministic integer in [-1000, 1000] from md5(p|d) — the same
    bytes every md5 implementation produces."""
    h = hashlib.md5(f"{p}|{d}".encode()).hexdigest()
    return int(h[:15], 16) % 2001 - 1000


def hyperplanes(dim: int, n_planes: int = N_PLANES) -> list[list[int]]:
    return [[_plane_entry(p, d) for d in range(dim)] for p in range(n_planes)]


def quantize_expr(emb_col: str) -> Column:
    """array<bigint> of floor(x * 1e6 + 0.5) — exact, portable."""
    return F.expr(
        f"transform({emb_col}, x -> cast(floor(cast(x as double) * {QUANT} + 0.5) as bigint))"
    )


def band_values(emb_col: str, dim: int) -> Column:
    """array<int> of N_BANDS packed band bucket values for one vector."""
    planes = hyperplanes(dim)
    plane_arrays = F.array(
        *[F.array(*[F.lit(v) for v in row]) for row in planes]
    )
    qe = quantize_expr(emb_col)
    # bit_p = 1 iff sum_d qe[d] * plane[p][d] > 0  (pure bigint arithmetic)
    bits = F.transform(
        plane_arrays,
        lambda plane: F.when(
            F.aggregate(
                F.zip_with(qe, plane, lambda x, y: x * y),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    def _pack(b: Column) -> Column:
        val = F.lit(0)
        for j in range(BAND_BITS):  # static bit positions: plain int shifts
            val = val + F.element_at(bits, b * BAND_BITS + j + 1) * (1 << j)
        return val

    return F.transform(F.sequence(F.lit(0), F.lit(N_BANDS - 1)), _pack)


def lsh_buckets(df: DataFrame, id_col: str, emb_col: str, dim: int) -> DataFrame:
    """(id, band, band_val) — one row per (vector, band); the equality-join
    key for candidate generation."""
    return df.select(
        F.col(id_col),
        F.posexplode(band_values(emb_col, dim)).alias("band", "band_val"),
    )


def hyperplanes_sql(dim: int, n_planes: int = N_PLANES) -> str:
    """DuckDB literal list-of-lists of the identical plane entries."""
    rows = hyperplanes(dim, n_planes)
    return "[" + ", ".join("[" + ", ".join(str(v) for v in r) + "]" for r in rows) + "]"


def lsh_buckets_sql(dim: int) -> str:
    """DuckDB CTE body: (vec_id, band, band_val) from `embeddings` — the
    SQL twin of lsh_buckets (integer arithmetic, same planes)."""
    return f"""
      SELECT vec_id, b.band,
             CAST(list_sum([bits[{BAND_BITS} * b.band + j + 1] * (1 << j)
                            FOR j IN range(0, {BAND_BITS})]) AS INT) AS band_val
      FROM (
        SELECT vec_id,
               [CASE WHEN list_sum([qe[i] * pl[i] FOR i IN range(1, {dim + 1})]) > 0
                     THEN 1 ELSE 0 END
                FOR pl IN planes] AS bits
        FROM (
          SELECT vec_id,
                 [CAST(FLOOR(CAST(x AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)
                  FOR x IN embedding] AS qe,
                 {hyperplanes_sql(dim)} AS planes
          FROM embeddings
        )
      )
      CROSS JOIN (SELECT unnest(range(0, {N_BANDS})) AS band) b
    """
