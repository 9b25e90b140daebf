"""Per-sequence feature kernels (reference parser.py:354-652).

Operate on array columns of the sequences shape (times:array<double>,
tokens:array<int>). Wherever semantics allow, the kernel is a *native array
expression* (JVM-side, whole-stage codegen, zero Python): IAT, SIZE,
IAT_SIZE, pad/truncate, header flag counts. The genuinely sequential or
numpy-only kernels (SAMP's dual 500-cap loop, FFT) are Arrow-batched pandas
UDFs with numpy inner loops — no per-row Python at the Spark boundary
(input_hint mandate).

Each kernel cites the reference lines whose output it reproduces; parity is
pinned by tests vs the numpy oracle (netml_spark.oracle.netml_ref).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from netml_spark.oracle import netml_ref

# ---------------------------------------------------------------------------
# Native array-expression kernels
# ---------------------------------------------------------------------------


def iat(times: Column | str) -> Column:
    """Inter-arrival gaps: np.diff twin (parser.py:354-375). Native:
    zip_with of the array against its own tail — no shuffle, no Python."""
    t = F.col(times) if isinstance(times, str) else times
    n = F.size(t)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 2, n - 1), F.slice(t, 1, n - 1), lambda a, b: a - b
        ),
    ).otherwise(F.array().cast("array<double>"))


def sizes_double(tokens: Column | str) -> Column:
    """SIZE feature: the token/size series as array<double> (parser.py:378-398)."""
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.transform(t, lambda x: x.cast("double"))


def iat_size(times: Column | str, tokens: Column | str) -> Column:
    """Interleave [iat_0, size_0, ..., iat_{n-2}, size_{n-2}, size_{n-1}]
    (parser.py:401-427; size_j pairs with iat_j, last size appended).
    Native: flatten(zip_with(iats, sizes[:n-1], (a,b)->array(a,b))) ++ [last]."""
    t = F.col(times) if isinstance(times, str) else times
    s = sizes_double(tokens)
    n = F.size(t)
    gaps = iat(t)
    pairs = F.flatten(
        F.zip_with(gaps, F.slice(s, 1, n - 1), lambda a, b: F.array(a, b))
    )
    return F.when(n >= 2, F.concat(pairs, F.slice(s, -1, 1))).otherwise(
        F.when(n == 1, F.slice(s, -1, 1)).otherwise(F.array().cast("array<double>"))
    )


def pad_truncate(v: Column | str, dim: int) -> Column:
    """v[:dim] else v ++ zeros (parser.py:818). Native slice+concat."""
    c = F.col(v) if isinstance(v, str) else v
    padded = F.concat(c, F.array_repeat(F.lit(0.0), int(dim)))
    return F.slice(padded, 1, int(dim))


TCP_FLAG_ORDER = "FSRPAUEC"


def header_flag_counts(flags_arr: Column | str, protos_arr: Column | str) -> Column:
    """8 TCP-flag counts over a per-sequence array of flag strings
    (parser.py:311-343): each char counted once per packet, only proto==6
    packets contribute. Native: per-flag aggregate over the zipped arrays."""
    fl = F.col(flags_arr) if isinstance(flags_arr, str) else flags_arr
    pr = F.col(protos_arr) if isinstance(protos_arr, str) else protos_arr
    zipped = F.zip_with(fl, pr, lambda f, p: F.struct(f.alias("f"), p.alias("p")))

    def count_flag(ch: str) -> Column:
        return F.aggregate(
            zipped,
            F.lit(0.0),
            lambda acc, x: acc
            + F.when((x["p"] == 6) & x["f"].contains(ch), 1.0).otherwise(0.0),
        )

    return F.array(*[count_flag(ch) for ch in TCP_FLAG_ORDER])


def header_features(flags_arr, protos_arr, ttls_arr) -> Column:
    """flag counts ++ per-packet TTLs (parser.py:300-349)."""
    ttl = F.col(ttls_arr) if isinstance(ttls_arr, str) else ttls_arr
    return F.concat(
        header_flag_counts(flags_arr, protos_arr),
        F.transform(ttl, lambda x: x.cast("double")),
    )


# ---------------------------------------------------------------------------
# Arrow/pandas-UDF kernels (sequential or numpy-only semantics)
# ---------------------------------------------------------------------------


def iat_pandas_udf():
    """Pandas-UDF twin of iat() — kept for benchmarking native vs Arrow."""

    @pandas_udf("array<double>")
    def _iat(times: pd.Series) -> pd.Series:
        return times.map(lambda v: np.diff(np.asarray(v, dtype=np.float64)))

    return _iat


def samp_udf(sampling_feature: str, sampling_rate: float):
    """SAMP_NUM / SAMP_SIZE with the reference's dual 500-caps
    (parser.py:472-559) — the per-gap zero-fill cap and the whole-feature
    500 truncation are order-dependent, so the loop is transcribed verbatim
    (delegated to the oracle kernel, which cites the lines). Arrow-batched;
    the loop runs per sequence, numpy inside."""
    rate = float(sampling_rate)
    feat = sampling_feature

    @pandas_udf("array<double>")
    def _samp(times: pd.Series, tokens: pd.Series) -> pd.Series:
        out = []
        for t, s in zip(times, tokens):
            out.append(
                netml_ref.get_SAMP(
                    np.asarray(t, dtype=np.float64),
                    np.asarray(s, dtype=np.float64),
                    sampling_feature=feat,
                    sampling_rate=rate,
                )
            )
        return pd.Series(out)

    return _samp


def fft_udf(fft_bin: int):
    """Real part of np.fft.fft(v, n=fft_bin) (parser.py:624-652)."""
    nbin = int(fft_bin)

    @pandas_udf("array<double>")
    def _fft(v: pd.Series) -> pd.Series:
        return v.map(
            lambda x: np.real(np.fft.fft(np.asarray(x, dtype=np.float64), n=nbin))
        )

    return _fft
