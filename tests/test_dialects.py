"""Golden envelope → op-record tests, per dialect (pattern: reference
tests/transform/test_dynamodb_cdc.py:201-300, test_aws_dms_*.py)."""

import pytest

from commons_codec_ray.decode.dialects import (
    MessageFormatError,
    UnknownOperationError,
    decode_binlog,
    decode_ddbstream,
    decode_debezium,
)
from commons_codec_ray.schemas import OP_DELETE, OP_SCHEMA_CHANGE, OP_UPSERT

TS = "2024-07-12T01:17:42.000123"


def _ddb(name, image_key, image):
    return {
        "eventSource": "aws:dynamodb",
        "eventName": name,
        "dynamodb": {"Keys": {"conv_id": {"S": "c-1"}, "turn_idx": {"N": "3"}}, image_key: image},
    }


class TestDdbStream:
    def test_insert(self):
        img = {
            "conv_id": {"S": "c-1"},
            "turn_idx": {"N": "3"},
            "role": {"S": "assistant"},
            "text": {"S": "Räuber"},  # multi-byte UTF-8 preserved
            "tool": {"NULL": True},
            "ts": {"S": TS},
        }
        [(op, rec, aux)] = decode_ddbstream(_ddb("INSERT", "NewImage", img))
        assert op == OP_UPSERT
        assert rec == {
            "conv_id": "c-1", "turn_idx": 3.0, "role": "assistant",
            "text": "Räuber", "tool": None, "ts": TS,
        }
        assert aux == {}

    def test_modify_full_row(self):
        img = {"conv_id": {"S": "c-1"}, "turn_idx": {"N": "3"}, "text": {"S": ""}}
        [(op, rec, _)] = decode_ddbstream(_ddb("MODIFY", "NewImage", img))
        assert op == OP_UPSERT
        assert rec["text"] == ""  # empty string, not null

    def test_remove_uses_keys(self):
        [(op, rec, _)] = decode_ddbstream(
            {"eventSource": "aws:dynamodb", "eventName": "REMOVE",
             "dynamodb": {"Keys": {"conv_id": {"S": "c-1"}, "turn_idx": {"N": "3"}}}}
        )
        assert op == OP_DELETE
        assert rec == {"conv_id": "c-1", "turn_idx": 3.0}

    def test_varied_list_to_aux(self):
        img = {"conv_id": {"S": "c-1"}, "turn_idx": {"N": "3"},
               "mix": {"L": [{"S": "a"}, {"N": "1"}]}}
        [(op, rec, aux)] = decode_ddbstream(_ddb("INSERT", "NewImage", img))
        assert "mix" not in rec
        assert aux == {"mix": ["a", 1.0]}

    def test_unknown_source_raises(self):
        with pytest.raises(MessageFormatError):
            decode_ddbstream({"eventSource": "aws:kinesis", "eventName": "INSERT", "dynamodb": {}})

    def test_unknown_event_raises(self):
        with pytest.raises(UnknownOperationError):
            decode_ddbstream(_ddb("UPSERT", "NewImage", {}))


class TestDebezium:
    DATA = {"conv_id": "c-1", "turn_idx": 3, "role": "user", "text": "hi", "tool": None, "ts": TS}

    def _env(self, operation, data=None, record_type="data"):
        return {
            "data": data if data is not None else dict(self.DATA),
            "before-image": {},
            "metadata": {"operation": operation, "schema-name": "public",
                         "table-name": "transcripts", "record-type": record_type},
        }

    @pytest.mark.parametrize("operation", ["load", "insert", "update"])
    def test_upserts(self, operation):
        [(op, rec, _)] = decode_debezium(self._env(operation))
        assert op == OP_UPSERT and rec == self.DATA

    def test_delete(self):
        data = {"conv_id": "c-1", "turn_idx": 3, "role": None, "text": None, "tool": None, "ts": None}
        [(op, rec, _)] = decode_debezium(self._env("delete", data))
        assert op == OP_DELETE

    def test_control_create_table(self):
        env = {
            "control": {"table-def": {"columns": {"rating": {"type": "INT32"}},
                                      "primary-key": ["conv_id", "turn_idx"]}},
            "metadata": {"operation": "create-table", "table-name": "transcripts",
                         "record-type": "control"},
        }
        [(op, _rec, aux)] = decode_debezium(env)
        assert op == OP_SCHEMA_CHANGE
        assert aux["operation"] == "create-table"
        assert aux["control"]["table-def"]["columns"]["rating"]["type"] == "INT32"

    def test_unknown_operation_raises(self):
        with pytest.raises(UnknownOperationError):
            decode_debezium(self._env("truncate"))

    def test_missing_data_raises(self):
        with pytest.raises(MessageFormatError):
            decode_debezium({"metadata": {"operation": "insert", "record-type": "data"}})


class TestBinlog:
    AFTER = {"conv_id": "c-1", "turn_idx": 3, "role": "user", "text": "hi", "tool": None, "ts": TS}

    def test_write_and_update(self):
        for opname in ("write_rows", "update_rows"):
            env = {"op": opname, "rows": [{"before": None, "after": dict(self.AFTER)}],
                   "table": {"schema": "public", "name": "transcripts"}}
            [(op, rec, _)] = decode_binlog(env)
            assert op == OP_UPSERT and rec == self.AFTER

    def test_delete(self):
        env = {"op": "delete_rows", "rows": [{"before": {"conv_id": "c-1", "turn_idx": 3}, "after": None}]}
        [(op, rec, _)] = decode_binlog(env)
        assert op == OP_DELETE and rec == {"conv_id": "c-1", "turn_idx": 3}

    def test_multi_row_envelope(self):
        env = {"op": "write_rows",
               "rows": [{"after": dict(self.AFTER)}, {"after": dict(self.AFTER, turn_idx=4)}]}
        out = decode_binlog(env)
        assert [r["turn_idx"] for _, r, _ in out] == [3, 4]

    @pytest.mark.parametrize("opname", ["rotate", "heartbeat"])
    def test_housekeeping_skipped(self, opname):
        # analog of MongoDB drop/invalidate → None (ref transform/mongodb.py:337-343)
        assert decode_binlog({"op": opname}) == []

    def test_unknown_op_raises(self):
        with pytest.raises(UnknownOperationError):
            decode_binlog({"op": "truncate_rows", "rows": []})


class TestMaxwell:
    from commons_codec_ray.decode.dialects import decode_maxwell  # noqa: PLC0415

    DATA = {"conv_id": "c-1", "turn_idx": 3, "role": "user", "text": "hi", "tool": None, "ts": TS}

    def _env(self, typ, data=None):
        return {"database": "public", "table": "transcripts", "type": typ,
                "ts": 42, "xid": 42, "commit": True,
                "data": self.DATA if data is None else data}

    @pytest.mark.parametrize("typ", ["insert", "update", "bootstrap-insert"])
    def test_upserts(self, typ):
        from commons_codec_ray.decode.dialects import decode_maxwell
        [(op, rec, aux)] = decode_maxwell(self._env(typ))
        assert op == OP_UPSERT and rec == self.DATA and aux == {}

    def test_delete_key_image(self):
        from commons_codec_ray.decode.dialects import decode_maxwell
        [(op, rec, _)] = decode_maxwell(self._env("delete", {"conv_id": "c-1", "turn_idx": 3}))
        assert op == OP_DELETE and rec == {"conv_id": "c-1", "turn_idx": 3}

    @pytest.mark.parametrize("typ", ["bootstrap-start", "bootstrap-complete", "heartbeat"])
    def test_housekeeping_skipped(self, typ):
        from commons_codec_ray.decode.dialects import decode_maxwell
        assert decode_maxwell({"type": typ}) == []

    def test_ddl_becomes_schema_change(self):
        from commons_codec_ray.decode.dialects import decode_maxwell
        [(op, _rec, aux)] = decode_maxwell({"type": "table-alter", "table": "transcripts"})
        assert op == OP_SCHEMA_CHANGE and aux["operation"] == "table-alter"

    def test_unknown_type_raises(self):
        from commons_codec_ray.decode.dialects import decode_maxwell
        with pytest.raises(UnknownOperationError):
            decode_maxwell(self._env("truncate"))

    def test_missing_data_raises(self):
        from commons_codec_ray.decode.dialects import decode_maxwell
        with pytest.raises(MessageFormatError):
            decode_maxwell({"type": "insert"})


class TestCanal:
    SQLTYPE = {"conv_id": 12, "turn_idx": 4, "role": 12, "text": 12, "tool": 12, "ts": 93}

    def _env(self, typ, rows):
        return {"data": rows, "database": "public", "es": 42, "id": 42,
                "isDdl": False, "old": None, "pkNames": ["conv_id", "turn_idx"],
                "sql": "", "sqlType": self.SQLTYPE, "table": "transcripts",
                "ts": 42, "type": typ}

    def test_insert_recovers_native_types(self):
        # Canal stringifies EVERY cell; sqlType drives the coercion back
        from commons_codec_ray.decode.dialects import decode_canal
        row = {"conv_id": "c-1", "turn_idx": "3", "role": "user",
               "text": "hi", "tool": None, "ts": TS}
        [(op, rec, _)] = decode_canal(self._env("INSERT", [row]))
        assert op == OP_UPSERT
        assert rec["turn_idx"] == 3 and isinstance(rec["turn_idx"], int)
        assert rec["ts"] == TS and rec["tool"] is None

    def test_delete_multi_row(self):
        from commons_codec_ray.decode.dialects import decode_canal
        rows = [{"conv_id": "c-1", "turn_idx": "3"}, {"conv_id": "c-2", "turn_idx": "4"}]
        out = decode_canal(self._env("DELETE", rows))
        assert [(op, r["turn_idx"]) for op, r, _ in out] == [(OP_DELETE, 3), (OP_DELETE, 4)]

    def test_float_coercion(self):
        from commons_codec_ray.decode.dialects import decode_canal
        env = self._env("INSERT", [{"conv_id": "c-1", "turn_idx": "3", "score": "1.5"}])
        env["sqlType"] = dict(self.SQLTYPE, score=8)  # JDBC DOUBLE
        [(_, rec, _)] = decode_canal(env)
        assert rec["score"] == 1.5

    def test_ddl_becomes_schema_change(self):
        from commons_codec_ray.decode.dialects import decode_canal
        [(op, _rec, aux)] = decode_canal(
            {"isDdl": True, "sql": "ALTER TABLE transcripts ADD rating INT", "table": "transcripts"})
        assert op == OP_SCHEMA_CHANGE and "ALTER" in aux["sql"]

    def test_unknown_type_raises(self):
        from commons_codec_ray.decode.dialects import decode_canal
        with pytest.raises(UnknownOperationError):
            decode_canal(self._env("TRUNCATE", []))

    def test_missing_rows_raises(self):
        from commons_codec_ray.decode.dialects import decode_canal
        with pytest.raises(MessageFormatError):
            decode_canal({"type": "INSERT", "isDdl": False})


class TestConnect:
    def _env(self, **payload):
        import json

        return {"schema": {"type": "struct", "fields": []}, "payload": payload}

    def test_upsert_and_snapshot_read(self):
        from commons_codec_ray.decode.dialects import decode_connect
        from commons_codec_ray.schemas import OP_UPSERT

        row = {"conv_id": "c-1", "turn_idx": 3, "role": "user", "text": "hi"}
        for op in ("c", "r", "u"):
            out = decode_connect(self._env(before=None, after=row, op=op))
            assert out == [(OP_UPSERT, row, {})]

    def test_delete_takes_before_image(self):
        from commons_codec_ray.decode.dialects import decode_connect
        from commons_codec_ray.schemas import OP_DELETE

        key = {"conv_id": "c-1", "turn_idx": 3}
        out = decode_connect(self._env(before=key, after=None, op="d"))
        assert out == [(OP_DELETE, key, {})]

    def test_truncate_skips_and_errors_raise(self):
        import pytest

        from commons_codec_ray.decode.dialects import (
            MessageFormatError,
            UnknownOperationError,
            decode_connect,
        )

        assert decode_connect(self._env(op="t")) == []
        with pytest.raises(UnknownOperationError):
            decode_connect(self._env(before=None, after={}, op="x"))
        with pytest.raises(MessageFormatError):
            decode_connect({"payload": {"op": "c", "after": {}}})  # no schema header
        with pytest.raises(MessageFormatError):
            decode_connect(self._env(before=None, after=None, op="c"))

    def test_encoder_roundtrip(self):
        import json

        from commons_codec_ray.decode.dialects import decode_connect
        from commons_codec_ray.envelopes import encode_connect
        from commons_codec_ray.schemas import OP_DELETE, OP_UPSERT

        up = json.loads(encode_connect("c-9", 5, False, "user", "txt", None, "2024-01-01T00:00:00", 8))
        assert decode_connect(up)[0][0] == OP_UPSERT
        assert decode_connect(up)[0][1]["text"] == "txt"
        de = json.loads(encode_connect("c-9", 5, True, None, None, None, "2024-01-01T00:00:00", 7))
        assert decode_connect(de) == [(OP_DELETE, {"conv_id": "c-9", "turn_idx": 5}, {})]


class TestMongo:
    """Golden cases ported from reference
    tests/transform/mongodb/test_mongodb_cdc.py:100-167, in Extended-JSON
    wire form (the bson-object fixtures' JSON serialization)."""

    OID = "669683c2b0750b2c84893f3e"

    def _msg(self, op_type, full=None, key=None):
        from commons_codec_ray.decode.dialects import decode_mongo  # noqa: F401

        msg = {
            "operationType": op_type,
            "clusterTime": {"$timestamp": {"t": 1721140162, "i": 2}},
            "ns": {"db": "testdrive", "coll": "data"},
        }
        if key is not None:
            msg["documentKey"] = key
        if full is not None:
            msg["fullDocument"] = full
        return msg

    def test_insert(self):
        from commons_codec_ray.decode.dialects import decode_mongo

        full = {
            "_id": {"$oid": self.OID},
            "id": "5F9E",
            "data": {"temperature": 42.42, "humidity": 84.84},
            "meta": {
                "timestamp": {"$date": "2024-07-11T23:17:42Z"},
                "device": "foo",
            },
        }
        [(op, rec, aux)] = decode_mongo(
            self._msg("insert", full=full, key={"_id": {"$oid": self.OID}})
        )
        assert op == OP_UPSERT
        assert aux == {"_id": self.OID}
        assert rec["id"] == "5F9E"
        assert rec["data"] == {"temperature": 42.42, "humidity": 84.84}
        assert rec["meta"]["device"] == "foo"
        assert "_id" not in rec  # oid routes to aux, like the reference's oid column

    def test_update_and_replace_take_full_document(self):
        from commons_codec_ray.decode.dialects import decode_mongo

        for op_type, full in (
            ("update", {"_id": {"$oid": self.OID}, "id": "5F9E",
                        "data": {"temperature": 42.5}}),
            ("replace", {"_id": {"$oid": self.OID}, "tags": ["deleted"]}),
        ):
            [(op, rec, aux)] = decode_mongo(
                self._msg(op_type, full=full, key={"_id": {"$oid": self.OID}})
            )
            assert op == OP_UPSERT
            assert aux == {"_id": self.OID}
            assert "_id" not in rec

    def test_delete_keys_off_document_key(self):
        from commons_codec_ray.decode.dialects import decode_mongo

        oid = "669693c5002ef91ea9c7a562"
        # sharded-collection documentKey: shard-key fields next to _id
        key = {"_id": {"$oid": oid}, "conv_id": "c-7",
               "turn_idx": {"$numberInt": "3"}}
        [(op, rec, aux)] = decode_mongo(self._msg("delete", key=key))
        assert op == OP_DELETE
        assert rec == {"conv_id": "c-7", "turn_idx": 3}
        assert aux == {"_id": oid}

    def test_drop_and_invalidate_skip(self):
        from commons_codec_ray.decode.dialects import decode_mongo

        assert decode_mongo(self._msg("drop")) == []
        assert decode_mongo(self._msg("invalidate")) == []

    def test_unsharded_delete_dead_letters(self):
        # unsharded collections: documentKey is {_id} only (the MongoDB
        # default) — after the oid routes to aux nothing remains to
        # address the configured primary key, so the row must
        # dead-letter instead of emitting a null-keyed delete
        from commons_codec_ray.decode.dialects import decode_mongo

        with pytest.raises(MessageFormatError, match="keyed only by _id"):
            decode_mongo(self._msg("delete", key={"_id": {"$oid": self.OID}}))

    def test_dbz_mongo_unsharded_delete_dead_letters(self):
        import json

        from commons_codec_ray.decode.dialects import decode_dbz_mongo

        msg = {"op": "d", "filter": json.dumps({"_id": {"$oid": self.OID}})}
        with pytest.raises(MessageFormatError, match="keyed only by _id"):
            decode_dbz_mongo(msg)

    def test_unknown_operation_raises(self):
        from commons_codec_ray.decode.dialects import decode_mongo

        with pytest.raises(UnknownOperationError, match="foobar"):
            decode_mongo(self._msg("foobar", key={"_id": {"$oid": self.OID}}))

    def test_missing_or_empty_optype_raises(self):
        from commons_codec_ray.decode.dialects import decode_mongo

        with pytest.raises(MessageFormatError, match="missing or empty"):
            decode_mongo({})
        with pytest.raises(MessageFormatError, match="missing or empty"):
            decode_mongo({"operationType": ""})

    def test_update_without_full_document_raises(self):
        from commons_codec_ray.decode.dialects import decode_mongo

        with pytest.raises(MessageFormatError, match="updateLookup"):
            decode_mongo(self._msg("update", key={"_id": {"$oid": self.OID}}))

    def test_extended_json_dates_become_iso_strings(self):
        from commons_codec_ray.decode.dialects import decode_mongo

        full = {
            "_id": {"$oid": self.OID},
            "conv_id": "c-1",
            "turn_idx": {"$numberInt": "5"},
            "ts": {"$date": {"$numberLong": "1720739862000"}},
        }
        [(op, rec, _)] = decode_mongo(
            self._msg("insert", full=full, key={"_id": {"$oid": self.OID}})
        )
        assert rec["turn_idx"] == 5
        assert isinstance(rec["ts"], str) and rec["ts"].startswith("2024-07-")

    def test_encoder_roundtrip(self):
        import json

        from commons_codec_ray.decode.dialects import decode_mongo
        from commons_codec_ray.envelopes import encode_mongo

        ts = "2024-07-12T01:17:42.000123"
        up = json.loads(encode_mongo("c-9", 7, False, "user", "hi", None, ts, 6))
        [(op, rec, aux)] = decode_mongo(up)
        assert op == OP_UPSERT
        assert rec == {"conv_id": "c-9", "turn_idx": 7, "role": "user",
                       "text": "hi", "tool": None, "ts": ts}
        assert len(aux["_id"]) == 24
        de = json.loads(encode_mongo("c-9", 7, True, None, None, None, ts, 6))
        [(op, rec, _)] = decode_mongo(de)
        assert op == OP_DELETE
        assert rec == {"conv_id": "c-9", "turn_idx": 7}


class TestDbzMongo:
    """Debezium MongoDB CONNECTOR envelope (string-embedded Extended
    JSON images) — distinct from the native change stream (TestMongo)."""

    def test_create_and_delete_roundtrip(self):
        import json

        from commons_codec_ray.decode.dialects import decode_dbz_mongo
        from commons_codec_ray.envelopes import encode_dbz_mongo

        ts = "2024-07-12T01:17:42.000123"
        up = json.loads(encode_dbz_mongo("c-3", 5, False, "user", "hey", "search", ts, 9))
        assert isinstance(up["after"], str)  # image is a STRING on the wire
        [(op, rec, _)] = decode_dbz_mongo(up)
        assert op == OP_UPSERT
        assert rec == {"conv_id": "c-3", "turn_idx": 5, "role": "user",
                       "text": "hey", "tool": "search", "ts": ts}
        de = json.loads(encode_dbz_mongo("c-3", 5, True, None, None, None, ts, 9))
        [(op, rec, _)] = decode_dbz_mongo(de)
        assert op == OP_DELETE
        assert rec == {"conv_id": "c-3", "turn_idx": 5}

    def test_schema_wrapper_tolerated_and_errors(self):
        import pytest as _pytest

        from commons_codec_ray.decode.dialects import decode_dbz_mongo

        wrapped = {"schema": {"type": "struct"},
                   "payload": {"op": "c", "after": '{"conv_id":"c-1","turn_idx":{"$numberInt":"2"}}'}}
        [(op, rec, _)] = decode_dbz_mongo(wrapped)
        assert op == OP_UPSERT and rec["turn_idx"] == 2
        with _pytest.raises(MessageFormatError):
            decode_dbz_mongo({"op": "u", "after": None})
        with _pytest.raises(UnknownOperationError):
            decode_dbz_mongo({"op": "zz"})
