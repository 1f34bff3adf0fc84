"""Distributed join operators Ray Data lacks natively.

As-of join (the streaming/timeseries workhorse: for each left row, the
latest right row with the same key and time ≤ left time) as a
composition of map_batches + coarse-bucket groupby — the pattern the
task spec prescribes for operators the Dataset API can't express
directly. Partitioning assumption: rows co-locate by ``hash(by) %
num_buckets``, so per-key time series never span buckets; per-bucket
work is a single vectorized ``pandas.merge_asof``.

Scale shape: one shuffle of (left ∪ right) on the bucket key; bucket
count bounds parallelism and per-group memory (grow with input). Skewed
keys cost what they cost in any keyed join — salt upstream if one key
dominates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from commons_codec_ray.util import adaptive_buckets, hash_bucket


def _pandas_null_dtype(arrow_type: pa.DataType | None) -> str:
    """Nullable pandas dtype matching an arrow type, so the no-right-rows
    branch produces blocks schema-consistent with matched buckets."""
    if arrow_type is None:
        return "object"
    if pa.types.is_integer(arrow_type):
        return "Int64"
    if pa.types.is_floating(arrow_type):
        return "float64"
    if pa.types.is_timestamp(arrow_type):
        return "datetime64[us]"
    return "object"


def _union_types(left_ds, right_ds) -> dict[str, pa.DataType]:
    types: dict[str, pa.DataType] = {}
    for f in right_ds.schema().base_schema:
        types[f.name] = f.type
    for f in left_ds.schema().base_schema:
        types[f.name] = f.type
    return types


def _key_bucket(t: pa.Table, by: list[str], num_buckets: int) -> pa.Array:
    """Bucket ids for a (possibly composite, possibly non-integer) join
    key. Single int64 keys take the splitmix fast path; everything else
    goes through pandas' C siphash (fixed key ⇒ deterministic across
    processes and runs), column-combined — so joins work on string and
    multi-column keys with the same co-location contract."""
    if len(by) == 1 and pa.types.is_integer(t[by[0]].type):
        keys = t[by[0]].to_numpy(zero_copy_only=False).astype(np.int64)
        return hash_bucket(keys, num_buckets)
    h = pd.util.hash_pandas_object(
        t.select(by).to_pandas(), index=False
    ).to_numpy()
    return pa.array((h & np.uint64(num_buckets - 1)).astype(np.int64))


def _tagged_union(left_ds, right_ds, all_cols, types, by, num_buckets):
    """Shared join scaffolding: tag each side with its bucket (_jb =
    hash(key) & (num_buckets-1)) and side (_right), null-pad to the union column
    set with the REAL arrow types (float64 padding would degrade int
    columns), and union into one schema-stable Dataset. ``by`` may be a
    column name or a list of names (composite key)."""
    by_cols = [by] if isinstance(by, str) else list(by)

    def pad(is_right: bool):
        def _p(t: pa.Table) -> pa.Table:
            t = t.append_column("_jb", _key_bucket(t, by_cols, num_buckets))
            t = t.append_column(
                "_right", pa.array(np.full(t.num_rows, is_right, dtype=bool))
            )
            for c in all_cols:
                if c not in t.column_names:
                    t = t.append_column(c, pa.nulls(t.num_rows, types[c]))
            return t.select([*all_cols, "_jb", "_right"])

        return _p

    return left_ds.map_batches(pad(False), batch_format="pyarrow").union(
        right_ds.map_batches(pad(True), batch_format="pyarrow")
    )


def asof_join(
    left_ds,
    right_ds,
    on: str = "ts",
    by: str = "user_id",
    right_columns: list[str] | None = None,
    suffix: str = "_right",
    num_buckets: int | None = None,
):
    """For each left row: columns of the LATEST right row with the same
    ``by`` key and ``right.on <= left.on`` (backward as-of, exact matches
    allowed) — nulls when no right row qualifies.

    Both sides are tagged and bucketed by ``hash(by)``, shuffled ONCE,
    and joined per bucket with ``pandas.merge_asof`` (vectorized
    two-pointer after an O(n log n) sort). Right rows are deduped to one
    per (by, on) — keep max of the first right column — so ties are
    deterministic (mirror any SQL oracle with the same QUALIFY dedupe).
    """
    # inputs are often mid-pipeline Datasets where count() would execute
    # the upstream — so the default scales with CLUSTER size (8x CPUs
    # floor in adaptive_buckets); pass num_buckets explicitly when a
    # cheap row count is known
    num_buckets = num_buckets or adaptive_buckets()
    right_columns = right_columns or [c for c in right_ds.schema().names if c not in (on, by)]
    left_cols = left_ds.schema().names

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df.loc[~df["_right"], left_cols].sort_values([on, by], kind="mergesort")
        r = df.loc[df["_right"], [by, on, *right_columns]]
        if len(r):
            # deterministic tie-break: keep ONE WHOLE right row per
            # (by, on) — drop_duplicates is row-atomic, unlike
            # groupby().last() which takes each column's last NON-NULL
            # value independently and can stitch together a row that
            # never existed
            r = (
                r.sort_values([by, on, *right_columns], kind="mergesort")
                .drop_duplicates(subset=[by, on], keep="last")
                .sort_values([on, by], kind="mergesort")
            )
            merged = pd.merge_asof(
                l, r, on=on, by=by, direction="backward", suffixes=("", suffix)
            )
        else:
            merged = l.copy()
            for c in right_columns:
                out_name = c if c not in l.columns else c + suffix
                merged[out_name] = pd.Series(
                    [None] * len(merged), dtype=_pandas_null_dtype(types.get(c)),
                    index=merged.index,
                )
        return merged

    all_cols = list(dict.fromkeys([*left_cols, by, on, *right_columns]))
    types = _union_types(left_ds, right_ds)
    tagged = _tagged_union(left_ds, right_ds, all_cols, types, by, num_buckets)
    return tagged.groupby("_jb").map_groups(join_bucket, batch_format="pandas")


def hash_join(
    left_ds,
    right_ds,
    on: str | list[str],
    how: str = "inner",
    right_columns: list[str] | None = None,
    suffix: str = "_right",
    num_buckets: int | None = None,
):
    """Shuffled large×large equi-join (inner or left) — the join shape
    broadcast joins can't cover: BOTH sides are partitioned on
    ``hash(on) % num_buckets`` in ONE tagged-union shuffle, then each
    bucket is joined with a vectorized ``pandas.merge``. Neither side is
    materialized on the driver or broadcast; per-bucket memory is
    |bucket_left| + |bucket_right| + |matches in bucket|, bounded by the
    adaptive bucket count (grows with input / cluster CPUs).

    Many-to-many keys multiply within their bucket only; a single hot
    key still lands in one group — salt upstream if one key dominates
    (same contract as every keyed join).

    Right non-key columns are cast to NULLABLE pandas dtypes before the
    merge so ``how="left"`` misses don't degrade int64 columns to
    float64 (NaN coercion) — the classic pandas silent-precision trap.
    """
    assert how in ("inner", "left", "outer"), how
    on_cols = [on] if isinstance(on, str) else list(on)
    num_buckets = num_buckets or adaptive_buckets()
    left_cols = left_ds.schema().names
    right_columns = right_columns or [
        c for c in right_ds.schema().names if c not in on_cols
    ]
    types = _union_types(left_ds, right_ds)
    all_cols = list(dict.fromkeys([*left_cols, *on_cols, *right_columns]))
    right_dtypes = {c: _pandas_null_dtype(types.get(c)) for c in right_columns}
    # full outer: unmatched RIGHT rows null-pad the left columns, so those
    # need nullable dtypes too (same int64→float64 trap, mirrored)
    left_dtypes = (
        {c: _pandas_null_dtype(types.get(c)) for c in left_cols if c not in on_cols}
        if how == "outer"
        else {}
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df.loc[~df["_right"], left_cols].astype(left_dtypes)
        r = df.loc[df["_right"], [*on_cols, *right_columns]].astype(right_dtypes)
        return l.merge(r, on=on_cols, how=how, suffixes=("", suffix))

    tagged = _tagged_union(left_ds, right_ds, all_cols, types, on, num_buckets)
    return tagged.groupby("_jb").map_groups(join_bucket, batch_format="pandas")


def range_join_agg(
    left_ds,
    right_ds,
    on: str = "ts",
    by: str = "user_id",
    value: str | None = None,
    window_us: int = 600_000_000,
    num_buckets: int | None = None,
):
    """Banded range join + aggregate: for each left row, COUNT (and SUM
    of ``value``) of right rows with the same ``by`` key and ``right.on``
    in ``[left.on - window, left.on]`` (both ends inclusive).

    Same partitioning contract as :func:`asof_join` (one shuffle on
    ``hash(by) % num_buckets``); inside a bucket the band is computed
    with ONE ``searchsorted`` over a per-key-offset composite int64 key
    (key ranges of different ``by`` values are separated by more than
    the window, so a band can never cross keys) + prefix sums — O(n log
    n) per bucket, no per-key loop, never materializing the O(n·matches)
    pair blowup that a generic range join produces.
    """

    num_buckets = num_buckets or adaptive_buckets()  # cluster-scaled default, see asof_join
    left_cols = left_ds.schema().names
    types = _union_types(left_ds, right_ds)
    right_extra = [value] if value else []
    all_cols = list(dict.fromkeys([*left_cols, by, on, *right_extra]))

    def band_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([by, on], kind="mergesort")
        n = len(df)
        keys_by = df[by].to_numpy(dtype="int64")
        ts = df[on].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = keys_by[1:] != keys_by[:-1]
        uidx = np.cumsum(new_key) - 1
        first_ts = ts[np.flatnonzero(new_key)][uidx]
        off = ts - first_ts
        span = int(off.max()) + int(window_us) + 2
        n_keys = int(uidx[-1]) + 1
        # int64-safe bound: loud failure beats silently-wrong band counts
        assert n_keys * span < (1 << 63), (
            f"composite range-join key overflows int64: {n_keys} keys x "
            f"span {span} us — raise num_buckets or shrink the time extent"
        )
        key = uidx * np.int64(span) + off
        is_r = df["_right"].to_numpy()
        rk = key[is_r]
        lk = key[~is_r]
        hi = np.searchsorted(rk, lk, side="right")
        lo = np.searchsorted(rk, lk - np.int64(window_us), side="left")
        out = df.loc[~is_r, left_cols].copy()
        out["n_in_range"] = (hi - lo).astype("int64")
        if value:
            rv = df.loc[is_r, value].to_numpy(dtype="float64")
            csum = np.concatenate([[0.0], np.cumsum(rv)])
            out["sum_in_range"] = csum[hi] - csum[lo]
        return out

    tagged = _tagged_union(left_ds, right_ds, all_cols, types, by, num_buckets)
    return tagged.groupby("_jb").map_groups(band_bucket, batch_format="pandas")


def hot_keys_estimate(
    ds, key: str, *, per_batch_top: int = 64, hot_frac: float = 0.01, max_hot: int = 64
) -> np.ndarray:
    """Cheap hot-key detection for skew handling: each batch reduces to
    its top-``per_batch_top`` key counts (a kilobyte), the driver sums
    them, and keys whose observed share exceeds ``hot_frac`` are
    returned (at most ``max_hot``).

    A globally hot key is hot in essentially every batch, so the
    per-batch truncation cannot miss it; a key missed by truncation was
    by definition not hot. Detection accuracy affects only load balance,
    never join correctness.
    """

    def batch_top(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[key].value_counts().head(per_batch_top)
        return pd.DataFrame(
            {key: vc.index.to_numpy(), "_cnt": vc.to_numpy(dtype="int64")}
        )

    parts = ds.map_batches(batch_top, batch_format="pandas").to_pandas()
    if parts.empty:
        return np.empty(0, dtype=np.int64)
    sums = parts.groupby(key)["_cnt"].sum().sort_values(ascending=False)
    total = int(sums.sum())
    hot = sums[sums >= hot_frac * total].head(max_hot)
    return hot.index.to_numpy(dtype=np.int64)


def salted_hash_join(
    left_ds,
    right_ds,
    on: str,
    how: str = "inner",
    right_columns: list[str] | None = None,
    suffix: str = "_right",
    num_buckets: int | None = None,
    num_salts: int = 8,
    hot_frac: float = 0.01,
    hot_keys: np.ndarray | None = None,
):
    """:func:`hash_join` with hot-key salting: the skew-resistant join.

    In a plain keyed join one dominant key puts its entire match volume
    in a single bucket — the straggler that stalls a 256-node cluster.
    Here hot keys (detected by :func:`hot_keys_estimate`, or passed in)
    are spread over ``num_salts`` sub-buckets: probe-side hot rows take
    salt ``row_index & (num_salts-1)`` (round-robin, perfectly
    balanced), build-side (right) hot rows are REPLICATED to every salt,
    and cold rows use salt 0 on both sides so they pay nothing. Bucket
    id is ``hash(key) * num_salts + salt`` — still ONE shuffle.

    Output is identical to :func:`hash_join` (tested); only the
    distribution of work changes. Replication cost: |hot build rows| x
    num_salts, bounded because hot keys are by construction few.
    """
    assert how in ("inner", "left"), how
    assert num_salts & (num_salts - 1) == 0, "num_salts must be a power of two"
    num_buckets = num_buckets or adaptive_buckets()
    if hot_keys is None:
        hot_keys = hot_keys_estimate(left_ds, on, hot_frac=hot_frac)
    left_cols = left_ds.schema().names
    right_columns = right_columns or [c for c in right_ds.schema().names if c != on]
    types = _union_types(left_ds, right_ds)
    all_cols = list(dict.fromkeys([*left_cols, on, *right_columns]))
    right_dtypes = {c: _pandas_null_dtype(types.get(c)) for c in right_columns}
    S = np.int64(num_salts)

    def pad(t: pa.Table, is_right: bool) -> pa.Table:
        for c in all_cols:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows, types[c]))
        t = t.append_column(
            "_right", pa.array(np.full(t.num_rows, is_right, dtype=bool))
        )
        return t.select([*all_cols, "_jb", "_right"])

    def tag_probe(t: pa.Table) -> pa.Table:
        keys = t[on].to_numpy(zero_copy_only=False).astype(np.int64)
        base = np.asarray(hash_bucket(keys, num_buckets)) * S
        salt = np.where(
            np.isin(keys, hot_keys),
            np.arange(len(keys), dtype=np.int64) & (S - 1),
            np.int64(0),
        )
        t = t.append_column("_jb", pa.array(base + salt))
        return pad(t, False)

    def tag_build(t: pa.Table) -> pa.Table:
        keys = t[on].to_numpy(zero_copy_only=False).astype(np.int64)
        base = np.asarray(hash_bucket(keys, num_buckets)) * S
        is_hot = np.isin(keys, hot_keys)
        cold = t.filter(pa.array(~is_hot)).append_column(
            "_jb", pa.array(base[~is_hot])
        )
        out = [pad(cold, True)]
        hot_t = t.filter(pa.array(is_hot))
        if hot_t.num_rows:
            hot_base = base[is_hot]
            for s in range(num_salts):
                rep = hot_t.append_column("_jb", pa.array(hot_base + np.int64(s)))
                out.append(pad(rep, True))
        return pa.concat_tables(out, promote_options="default")

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df.loc[~df["_right"], left_cols]
        r = df.loc[df["_right"], [on, *right_columns]].astype(right_dtypes)
        return l.merge(r, on=on, how=how, suffixes=("", suffix))

    tagged = left_ds.map_batches(tag_probe, batch_format="pyarrow").union(
        right_ds.map_batches(tag_build, batch_format="pyarrow")
    )
    return tagged.groupby("_jb").map_groups(join_bucket, batch_format="pandas")


def snapshot_diff(
    old_ds,
    new_ds,
    keys: list[str],
    compare: list[str],
    num_buckets: int | None = None,
):
    """Reverse CDC (engine-added): derive a row-level change feed by
    DIFFING two consistent snapshots — keys only in ``new_ds`` →
    ``insert`` (new image), only in ``old_ds`` → ``delete`` (before
    image), in both with any ``compare`` column differing (null-safe) →
    ``update`` (new image); identical rows are dropped.  The operator
    that backfills a change feed when the event log was never captured
    (e.g. lake epoch N vs N+1).

    Scale shape: one shuffle — both snapshots tagged with
    ``hash(keys) % num_buckets`` and unioned, then a single vectorized
    outer merge + column compare per bucket.  Keys never span buckets,
    so the diff is exact.
    """
    nb = num_buckets or adaptive_buckets()

    def tag(is_new: bool):
        def _t(t: pa.Table) -> pa.Table:
            t = t.append_column("_jb", _key_bucket(t, keys, nb))
            return t.append_column(
                "_new", pa.array(np.full(t.num_rows, is_new, dtype=bool))
            )

        return _t

    both = old_ds.map_batches(tag(False), batch_format="pyarrow").union(
        new_ds.map_batches(tag(True), batch_format="pyarrow")
    )

    def _nullable(dt) -> str:
        return ("U" if dt.kind == "u" else "") + "Int" + str(dt.itemsize * 8)

    def diff(df: pd.DataFrame) -> pd.DataFrame:
        old = df.loc[~df["_new"], keys + compare].copy()
        new = df.loc[df["_new"], keys + compare].copy()
        # the outer merge introduces missing values on one side for
        # inserts/deletes; plain int columns would silently upcast to
        # float64 (lossy above 2^53). Move integer compare columns to
        # pandas nullable Int* for the merge and restore the exact
        # original dtype on the never-null output below.
        int_dtypes = {c: old[c].dtype for c in compare if old[c].dtype.kind in "iu"}
        for c, dt in int_dtypes.items():
            old[c] = old[c].astype(_nullable(dt))
            new[c] = new[c].astype(_nullable(dt))
        m = old.merge(new, on=keys, how="outer", suffixes=("_o", "_n"), indicator=True)
        is_ins = (m["_merge"] == "right_only").to_numpy()
        is_del = (m["_merge"] == "left_only").to_numpy()
        changed = np.zeros(len(m), dtype=bool)
        for c in compare:
            a, b = m[f"{c}_o"], m[f"{c}_n"]
            eq = (a == b) | (a.isna() & b.isna())
            # nullable compare yields pd.NA when exactly one side is
            # missing — that's a change, so NA counts as not-equal
            changed |= ~eq.fillna(False).to_numpy(dtype=bool)
        keep = is_ins | is_del | changed
        m = m.loc[keep]
        is_del = is_del[keep]
        is_ins = is_ins[keep]
        out = {
            "change": np.select(
                [is_ins, is_del], ["insert", "delete"], default="update"
            )
        }
        for k in keys:
            out[k] = m[k]
        for c in compare:
            vals = m[f"{c}_n"].where(~is_del, m[f"{c}_o"])
            if c in int_dtypes:
                vals = vals.astype(int_dtypes[c])
            out[c] = vals
        return pd.DataFrame(out)

    return both.groupby("_jb").map_groups(diff, batch_format="pandas")
