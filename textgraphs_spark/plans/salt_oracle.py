"""Oracle for the SALTED blocking path (blocking._salt_oversized).

The driver corpus never trips the pair-budget cap (the ER oracle's
preconditions guarantee it), so without this module the skew path would
be pytest-only. Here a deterministic entity set with one HOT block
(far above max_block_size) runs through the real
``blocking.candidate_pairs`` — salting fires, pairs across shards are
dropped — and a DuckDB twin reproduces the capped-pair semantics
value-for-value.

Shard assignment is ``pmod(xxhash64(entity_key), n_shards)``. DuckDB has
no seeded xxhash64, but the assignment is deterministic, so the oracle
inlines a (entity_key, xxh) sidecar computed by ``xxh64_str`` — a pure-
Python XXH64 (seed 42, UTF-8 bytes, signed two's-complement result)
asserted bit-equal to Spark's ``F.xxhash64`` in tests/test_operators.py.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 (Cyan4973 spec) returning Spark's SIGNED long convention.

    Spark's ``F.xxhash64`` hashes a string column's UTF-8 bytes with
    seed 42; this is the same function in pure Python.
    """
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little")); i += 8
            v2 = _round(v2, int.from_bytes(data[i:i + 8], "little")); i += 8
            v3 = _round(v3, int.from_bytes(data[i:i + 8], "little")); i += 8
            v4 = _round(v4, int.from_bytes(data[i:i + 8], "little")); i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h = ((_rotl(h ^ _round(0, int.from_bytes(data[i:i + 8], "little")), 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ (int.from_bytes(data[i:i + 4], "little") * _P1) & _M, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_str(s: str, seed: int = 42) -> int:
    return xxh64(s.encode("utf-8"), seed)


MAX_BLOCK_SIZE = 25  # deliberately small so the 120-member block shards


def hot_entities() -> list[tuple[str, str]]:
    """Deterministic (entity_key, surface) rows with one hot block.

    * 120 surfaces 'Alfa<xx> Omega'  → ONE block 'omega|a' (120 ≫ 25:
      salting shards it into ceil(120/25) = 5 pieces);
    * 40 surfaces 'Beta<xx> Sigma<k>' → eight 5-member blocks (under
      the cap: every intra-block pair survives);
    * 90 singleton blocks (produce no pairs).
    """
    import string

    letters = string.ascii_lowercase

    def suffix(i: int) -> str:
        return letters[i % 26] + letters[(i // 26) % 26]

    rows = []
    for i in range(120):
        rows.append((f"e{i:03d}", f"Alfa{suffix(i)} Omega"))
    for i in range(120, 160):
        rows.append((f"e{i:03d}", f"Beta{suffix(i)} Sigma{letters[i % 8]}"))
    for i in range(160, 250):
        rows.append((f"e{i:03d}", f"Gamma{suffix(i)} Delta{suffix(i)}"))
    return rows


def salted_blocking_pairs_sql(max_block_size: int = MAX_BLOCK_SIZE) -> str:
    """DuckDB twin of blocking.candidate_pairs over ``hot_entities``:
    normalize → (last_tok, first_init) block key → size census →
    ceil(n/max) shards for oversized blocks → pmod(xxh, shards) salt →
    intra-shard pairs only. The xxh sidecar is inlined VALUES."""
    ents = ",\n   ".join(
        f"('{k}', '{s}')" for k, s in hot_entities()
    )
    salts = ",\n   ".join(
        f"('{k}', CAST({xxh64_str(k)} AS BIGINT))" for k, _ in hot_entities()
    )
    return f"""WITH
entities(entity_key, surface) AS (VALUES
   {ents}
),
salts(entity_key, xxh) AS (VALUES
   {salts}
),
normed AS (
  SELECT e.entity_key, e.surface, s.xxh,
         regexp_split_to_array(trim(lower(regexp_replace(e.surface, '[^A-Za-z ]', '', 'g'))), ' +') AS toks
  FROM entities e JOIN salts s ON e.entity_key = s.entity_key
),
keyed AS (
  SELECT entity_key, surface, xxh,
         concat_ws('|', toks[len(toks)], substring(toks[1], 1, 1)) AS block_key
  FROM normed
),
sizes AS (
  SELECT block_key, count(*) AS n,
         CAST(ceil(count(*) / CAST({max_block_size} AS DOUBLE)) AS INT) AS n_shards
  FROM keyed GROUP BY block_key
),
salted AS (
  SELECT k.entity_key, k.surface, k.block_key,
         CASE WHEN z.n > {max_block_size}
              THEN k.block_key || '#' ||
                   CAST(((k.xxh % z.n_shards) + z.n_shards) % z.n_shards AS VARCHAR)
              ELSE k.block_key END AS salted_key
  FROM keyed k JOIN sizes z ON k.block_key = z.block_key
)
SELECT a.block_key, a.entity_key AS left_id, b.entity_key AS right_id,
       a.surface AS left_surface, b.surface AS right_surface
FROM salted a JOIN salted b
  ON a.salted_key = b.salted_key AND a.entity_key < b.entity_key
ORDER BY left_id, right_id
"""
