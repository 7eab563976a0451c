"""DuckDB SQL generator for Spark-compatible xxHash64 of short strings.

Spark's ``xxhash64(col)`` (seed 42) hashes the UTF-8 bytes with XXH64;
replaying it in the DuckDB oracle lets hash-derived pipelines (SimHash
signatures, synthetic media metadata) get exact value-hash parity
instead of rows-only checks. Scope: inputs < 16 bytes (at most one
8-byte word — ample for whitespace tokens and media refs; callers
guard corpus bounds) and ASCII (ord == UTF-8 byte).

Arithmetic: u64 emulated in HUGEINT. A direct ``a*b % 2^64`` overflows
signed 128-bit when both operands approach 2^64, so multiplication is
split at 32 bits: ``a*b mod 2^64 = (a_lo*b + ((a_hi*(b mod 2^32))<<32))
mod 2^64`` (the a_hi*b_hi term is ≡ 0 mod 2^64). Every rotate/multiply
input is materialized as a chained-CTE column first, so no
subexpression string blows up.
"""

from __future__ import annotations

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _u(expr: str) -> str:
    return f"(({expr}) % 18446744073709551616)"


def _mul(col: str, const: int) -> str:
    """(col * const) mod 2^64 — ``col`` must be a bare column name."""
    lo = const % (1 << 32)
    return _u(f"({col} % 4294967296) * {const} + ((({col} >> 32) * {lo}) << 32)")


def _rotl(col: str, r: int) -> str:
    return _u(f"({col} << {r}) | ({col} >> {64 - r})")


def xxh64_int_const_ctes(src: str, k: int, seed_col: str, out: str, *, prefix: str):
    """Chained CTEs for Spark's ``xxhash64(..., lit(k))`` continuation:
    XXH64 of the 4-byte INT literal ``k`` with the previous hash as
    seed (Spark chains multi-arg hashes; lit ints take the hashInt
    path: h = seed+P5+4; h ^= (k & 0xffffffff)*P1; h = rotl(h,23)*P2+P3;
    avalanche). ``k*P1 mod 2^64`` folds to a literal."""
    p = prefix
    kconst = ((k & 0xFFFFFFFF) * P1) % (1 << 64)
    ctes: list[str] = []
    cur = src
    n = 0

    def step(cols: str) -> None:
        nonlocal cur, n
        ctes.append(f"{p}{n} AS (SELECT *, {cols} FROM {cur})")
        cur = f"{p}{n}"
        n += 1

    step(_u(f"{seed_col} + {P5} + 4") + f" AS {p}_h0")
    step(f"xor({p}_h0, CAST({kconst} AS HUGEINT)) AS {p}_h1")
    step(f"{_rotl(p + '_h1', 23)} AS {p}_h1r")
    step(_u(_mul(p + "_h1r", P2) + f" + {P3}") + f" AS {p}_h2")
    step(f"xor({p}_h2, {p}_h2 >> 33) AS {p}_a1")
    step(f"{_mul(p + '_a1', P2)} AS {p}_a2")
    step(f"xor({p}_a2, {p}_a2 >> 29) AS {p}_a3")
    step(f"{_mul(p + '_a3', P3)} AS {p}_a4")
    step(f"xor({p}_a4, {p}_a4 >> 32) AS {out}")
    return ctes, cur


def pmod_signed(h_col: str, m: int) -> str:
    """Spark ``pmod(hash, m)`` where the JVM sees the hash as a SIGNED
    long: signed = h - 2^64*[h >= 2^63], and pmod = ((signed % m) + m)
    % m = ((h % m) - (2^64 % m)*[h >= 2^63] + 2*m) % m on u64 h."""
    w = (1 << 64) % m
    return (
        f"((({h_col} % {m}) - CASE WHEN {h_col} >= 9223372036854775808 "
        f"THEN {w} ELSE 0 END + {2 * m}) % {m})"
    )


def xxh64_ctes(src: str, text_col: str, out: str, *, prefix: str, seed: int = 42):
    """Build chained CTEs computing XXH64(utf8(text_col), seed) as a
    HUGEINT column ``out`` in [0, 2^64); all other columns of ``src``
    pass through. Returns (list_of_cte_sql, final_cte_name)."""
    p = prefix
    ctes: list[str] = []
    cur = src
    n = 0

    def step(cols: str) -> None:
        nonlocal cur, n
        ctes.append(f"{p}{n} AS (SELECT *, {cols} FROM {cur})")
        cur = f"{p}{n}"
        n += 1

    word = " + ".join(
        f"(CAST(ord(substr({text_col}, {j + 1}, 1)) AS HUGEINT) << {8 * j})"
        for j in range(8)
    )
    # extracted fields: length, full word (if any), trailing 4-byte int,
    # trailing bytes, and the seed+P5+len initial state
    step(
        f"CAST(length({text_col}) AS HUGEINT) AS _len, "
        f"CAST(CASE WHEN length({text_col}) >= 8 THEN 1 ELSE 0 END AS HUGEINT) AS _w8"
    )
    step(
        f"CASE WHEN _len >= 8 THEN {word} END AS _wd, "
        f"_len - _w8 * 8 AS _rem, "
        + _u(f"CAST({seed} AS HUGEINT) + {P5} + _len")
        + " AS _h0"
    )
    i4 = " + ".join(
        f"(CAST(ord(substr({text_col}, CAST(_w8 * 8 + {j + 1} AS INT), 1)) AS HUGEINT) << {8 * j})"
        for j in range(4)
    )
    step(
        f"CASE WHEN _rem >= 4 THEN {i4} END AS _i4, "
        f"CASE WHEN _rem >= 4 THEN _rem - 4 ELSE _rem END AS _nb, "
        f"CASE WHEN _rem >= 4 THEN _w8 * 8 + 4 ELSE _w8 * 8 END AS _boff"
    )
    # one 8-byte word round: k = rotl(wd*P2,31)*P1; h = rotl(h^k,27)*P1+P4
    step(f"CASE WHEN _len >= 8 THEN {_mul('_wd', P2)} END AS _k1")
    step(f"CASE WHEN _len >= 8 THEN {_rotl('_k1', 31)} END AS _k2")
    step(f"CASE WHEN _len >= 8 THEN {_mul('_k2', P1)} END AS _k3")
    step("CASE WHEN _len >= 8 THEN xor(_h0, _k3) ELSE _h0 END AS _h1")
    step(f"CASE WHEN _len >= 8 THEN {_rotl('_h1', 27)} ELSE _h1 END AS _h1r")
    step(
        "CASE WHEN _len >= 8 THEN "
        + _u(_mul("_h1r", P1) + f" + {P4}")
        + " ELSE _h1 END AS _h2"
    )
    # 4-byte round: h = rotl(h ^ (i4*P1), 23)*P2 + P3
    step(f"CASE WHEN _rem >= 4 THEN xor(_h2, {_mul('_i4', P1)}) ELSE _h2 END AS _h3")
    step(f"CASE WHEN _rem >= 4 THEN {_rotl('_h3', 23)} ELSE _h3 END AS _h3r")
    step(
        "CASE WHEN _rem >= 4 THEN "
        + _u(_mul("_h3r", P2) + f" + {P3}")
        + " ELSE _h3 END AS _h4"
    )
    # up to 3 trailing bytes: h = rotl(h ^ byte*P5, 11)*P1
    prev = "_h4"
    for j in range(3):
        byte = (
            f"CAST(ord(substr({text_col}, CAST(_boff + {j + 1} AS INT), 1)) AS HUGEINT)"
        )
        step(
            f"CASE WHEN _nb > {j} THEN xor({prev}, {_u(byte + f' * {P5}')}) "
            f"ELSE {prev} END AS _hb{j}"
        )
        step(
            f"CASE WHEN _nb > {j} THEN {_rotl(f'_hb{j}', 11)} ELSE _hb{j} END AS _hb{j}r"
        )
        step(
            f"CASE WHEN _nb > {j} THEN {_mul(f'_hb{j}r', P1)} ELSE _hb{j}r END AS _hb{j}f"
        )
        prev = f"_hb{j}f"
    # avalanche: h ^= h>>33; h*=P2; h ^= h>>29; h*=P3; h ^= h>>32
    step(f"xor({prev}, {prev} >> 33) AS _a1")
    step(f"{_mul('_a1', P2)} AS _a2")
    step("xor(_a2, _a2 >> 29) AS _a3")
    step(f"{_mul('_a3', P3)} AS _a4")
    step(f"xor(_a4, _a4 >> 32) AS {out}")
    return ctes, cur
