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
