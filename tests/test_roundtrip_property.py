"""Property-based envelope round-trip: random transcript rows → encode in
any dialect → decode → identical op record. Complements the golden tests
with generated edge cases (empty strings, multi-byte UTF-8, extreme
timestamps within range)."""

import datetime as dt
import json

from hypothesis import given, settings, strategies as st

from commons_codec_ray.decode.dialects import DECODERS
from commons_codec_ray.envelopes import encode_binlog, encode_ddbstream, encode_debezium
from commons_codec_ray.schemas import OP_DELETE, OP_UPSERT

_ENCODERS = {"debezium": encode_debezium, "binlog": encode_binlog, "ddbstream": encode_ddbstream}

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)
ts_strategy = st.datetimes(
    min_value=dt.datetime(1970, 1, 1), max_value=dt.datetime(2200, 1, 1)
)


@settings(max_examples=150, deadline=None)
@given(
    dialect=st.sampled_from(["debezium", "binlog", "ddbstream"]),
    conv_id=st.text(min_size=1, max_size=40).filter(lambda s: s.strip()),
    turn_idx=st.integers(min_value=0, max_value=2**31 - 1),
    is_delete=st.booleans(),
    role=text_strategy,
    text=text_strategy,
    tool=st.one_of(st.none(), text_strategy),
    ts=ts_strategy,
    lsn=st.integers(min_value=0, max_value=2**62),
)
def test_encode_decode_roundtrip(dialect, conv_id, turn_idx, is_delete, role, text, tool, ts, lsn):
    ts_iso = ts.isoformat(timespec="microseconds")
    payload = _ENCODERS[dialect](conv_id, turn_idx, is_delete, role, text, tool, ts_iso, lsn)
    decoded = DECODERS[dialect](json.loads(payload))
    assert len(decoded) == 1
    op, rec, aux = decoded[0]
    assert aux == {}
    assert str(rec["conv_id"]) == conv_id
    assert int(rec["turn_idx"]) == turn_idx
    if is_delete:
        assert op == OP_DELETE
    else:
        assert op == OP_UPSERT
        assert rec["role"] == role
        assert rec["text"] == text  # byte-exact text round trip
        assert rec["tool"] == tool
        assert rec["ts"] == ts_iso


@settings(max_examples=80, deadline=None)
@given(
    doc=st.dictionaries(
        st.text(min_size=1, max_size=10).filter(lambda s: not s.startswith("$")),
        st.recursive(
            st.one_of(
                st.none(), st.booleans(), st.integers(-(2**53), 2**53),
                st.floats(allow_nan=False, allow_infinity=False), text_strategy,
            ),
            lambda children: st.one_of(
                st.lists(children, max_size=4),
                st.dictionaries(st.text(min_size=1, max_size=6).filter(lambda s: not s.startswith("$")), children, max_size=4),
            ),
            max_leaves=12,
        ),
        max_size=8,
    )
)
def test_extended_json_plain_values_pass_through(doc):
    """Documents without $-descriptors decode to themselves."""
    from commons_codec_ray.decode.extended_json import decode_document

    assert decode_document(doc) == doc


@settings(max_examples=200, deadline=None)
@given(
    dialect=st.sampled_from(
        ["debezium", "binlog", "ddbstream", "maxwell", "canal",
         "connect", "mongo", "dbz_mongo"]
    ),
    uid=st.integers(min_value=0, max_value=2**40),
    turn_idx=st.integers(min_value=0, max_value=2**31 - 1),
    is_delete=st.booleans(),
    role=text_strategy,
    text=text_strategy,
    tool=st.one_of(st.none(), text_strategy),
    ts=ts_strategy,
    lsn=st.integers(min_value=0, max_value=2**62),
)
def test_encode_decode_roundtrip_all_dialects(
    dialect, uid, turn_idx, is_delete, role, text, tool, ts, lsn
):
    """All EIGHT dialect grammars round-trip the same logical op.
    conv_id uses the engine's 'c-<uid>' shape (the mongo encoders derive
    a deterministic ObjectId from it); mongo-family timestamps round-trip
    through a datetime re-serialization, so they compare parsed."""
    from commons_codec_ray.envelopes import _ENCODERS as ALL_ENCODERS

    conv_id = f"c-{uid}"
    ts_iso = ts.isoformat(timespec="microseconds")
    payload = ALL_ENCODERS[dialect](conv_id, turn_idx, is_delete, role, text, tool, ts_iso, lsn)
    decoded = DECODERS[dialect](json.loads(payload))
    assert len(decoded) == 1
    op, rec, aux = decoded[0]
    if dialect == "mongo":
        assert len(aux["_id"]) == 24
    else:
        assert aux == {}
    assert str(rec["conv_id"]) == conv_id
    assert int(rec["turn_idx"]) == turn_idx
    if is_delete:
        assert op == OP_DELETE
        return
    assert op == OP_UPSERT
    assert rec["role"] == role
    assert rec["text"] == text  # byte-exact text round trip
    assert rec["tool"] == tool
    if dialect in ("mongo", "dbz_mongo"):
        assert dt.datetime.fromisoformat(rec["ts"]) == ts
    else:
        assert rec["ts"] == ts_iso


# --- adversarial envelope fuzzing (VERDICT r4 #9) ---------------------------
# Poison envelopes must dead-letter, never crash the decode stage and
# never emit a silently null-keyed data op.

import pyarrow as pa

from commons_codec_ray.config import PipelineConfig
from commons_codec_ray.envelopes import (
    encode_canal,
    encode_connect,
    encode_dbz_mongo,
    encode_maxwell,
    encode_mongo,
)
from commons_codec_ray.schemas import OP_DEAD
from commons_codec_ray.stages.decode_stage import DecodeEnvelopes, split_dead_letters

_ALL_ENCODERS = {
    "debezium": encode_debezium,
    "binlog": encode_binlog,
    "ddbstream": encode_ddbstream,
    "maxwell": encode_maxwell,
    "canal": encode_canal,
    "connect": encode_connect,
    "mongo": encode_mongo,
    "dbz_mongo": encode_dbz_mongo,
}

_WRONG_VALUES = (None, 123, "garbage", {}, [], {"взрыв": ["☃", {"x": None}]})


def _mutate(doc: dict, which_key: int, wrong: int):
    """Deterministic single-point mutation of a parsed envelope."""
    keys = sorted(doc)
    out = dict(doc)
    key = keys[which_key % len(keys)]
    if wrong == len(_WRONG_VALUES):  # drop the field entirely
        del out[key]
    else:
        out[key] = _WRONG_VALUES[wrong]
    return out


def _envelope_batch(payloads: list[str], dialect: str) -> pa.Table:
    n = len(payloads)
    return pa.table(
        {
            "lsn": pa.array(range(1, n + 1), pa.int64()),
            "source_offset": pa.array(range(n), pa.int64()),
            "dialect": pa.array([dialect] * n, pa.string()),
            "payload": pa.array(payloads, pa.string()),
        }
    )


@settings(max_examples=120, deadline=None)
@given(
    dialect=st.sampled_from(sorted(_ALL_ENCODERS)),
    which_key=st.integers(min_value=0, max_value=30),
    wrong=st.integers(min_value=0, max_value=len(_WRONG_VALUES)),
    is_delete=st.booleans(),
    lsn=st.integers(min_value=0, max_value=2**62),
)
def test_adversarial_envelope_decodes_or_dead_letters(
    dialect, which_key, wrong, is_delete, lsn
):
    """One-point-mutated envelopes (field dropped / wrong-typed /
    unicode-keyed) through the per-dialect decoder: any failure must be
    an exception (→ dead letter in the stage), and when the decoder
    succeeds but yields a data op with NO key columns — the
    silent-delete hazard — the direct-layout stage must dead-letter
    that row rather than emit a phantom (null, null)-keyed op."""
    from commons_codec_ray.schemas import OP_DEAD, OP_DELETE, OP_UPSERT

    payload = _ALL_ENCODERS[dialect](
        "c-7", 3, is_delete, "user", "héllo ☃", None,
        "2024-01-02T03:04:05.000000", lsn,
    )
    mutated = _mutate(json.loads(payload), which_key, wrong)
    try:
        decoded = DECODERS[dialect](mutated)
    except Exception:
        return  # exception == dead letter in the stage: acceptable
    null_keyed = any(
        op in (OP_UPSERT, OP_DELETE)
        and rec.get("conv_id") is None
        and rec.get("turn_idx") is None
        for op, rec, _aux in decoded
    )
    for _op, rec, _aux in decoded:
        assert isinstance(rec, dict)
    if null_keyed:
        stage = DecodeEnvelopes(PipelineConfig(), combine=False)
        out = stage(_envelope_batch([json.dumps(mutated)], dialect))
        ops = out["op"].to_pylist()
        cids = out["conv_id"].to_pylist()
        tis = out["turn_idx"].to_pylist()
        for op, cid, ti in zip(ops, cids, tis):
            assert not (
                op in (OP_UPSERT, OP_DELETE) and cid is None and ti is None
            ), f"null-keyed data op survived the stage: {mutated!r}"
        assert OP_DEAD in ops, f"null-keyed op neither kept nor dead-lettered: {mutated!r}"


def test_poison_batch_dead_letters_with_lineage_counts(ray_session):
    """A mixed batch (valid + structurally poison envelopes per dialect)
    through the full DecodeEnvelopes stage: never raises, every poison
    row becomes a self-describing OP_DEAD row, and split_dead_letters
    partitions exactly — the counts cdc_lineage reports."""
    valid, poison = [], []
    for d, enc in _ALL_ENCODERS.items():
        valid.append((d, enc("c-1", 1, False, "user", "ok", None,
                              "2024-01-02T03:04:05.000000", 10)))
        poison.append((d, "not json at all {"))
        poison.append((d, json.dumps({"utterly": {"wrong": ["shape", 1]}})))
    stage = DecodeEnvelopes(PipelineConfig(), combine=False)
    for d in _ALL_ENCODERS:
        batch = _envelope_batch(
            [p for dd, p in valid + poison if dd == d], d
        )
        out = stage(batch)
        good, dead = split_dead_letters(out)
        assert dead.num_rows == 2, d
        assert good.num_rows >= 1, d
        errs = dead["error"].to_pylist()
        assert all(e for e in errs), d
        # self-describing: dialect + raw payload survive in aux for replay
        for a in dead["aux"].to_pylist():
            blob = json.loads(a)
            assert blob["dialect"] == d and blob["payload"], d


def test_huge_lsn_and_unicode_keys_survive_decode():
    """int64-edge lsn and multi-byte key/field values must decode, not
    overflow (the mongo ENCODERS derive the fixture ObjectId from a
    ``c-<digits>`` conv_id, so those two dialects keep the numeric key
    but still carry the unicode field values)."""
    for d, enc in _ALL_ENCODERS.items():
        cid = "c-77" if d in ("mongo", "dbz_mongo") else "Ключ-🙂"
        payload = enc(cid, 2**31 - 1, False, "rôle", "τext", "🛠",
                      "2024-01-02T03:04:05.000000", 2**62)
        decoded = DECODERS[d](json.loads(payload))
        assert len(decoded) == 1
        op, rec, _ = decoded[0]
        assert str(rec["conv_id"]) == cid
        assert int(rec["turn_idx"]) == 2**31 - 1
        assert rec["role"] == "rôle" and rec["text"] == "τext"
