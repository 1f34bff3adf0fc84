"""Telemetry decoder tests (pattern: reference tests/decode/test_tasmota.py,
test_sensor_community.py, test_tts_ttn.py with doc-sourced payloads)."""

import pyarrow as pa

from commons_codec_ray.decode.iot import (
    FlattenStage,
    decode_sensor_community,
    decode_tasmota_sensor,
    decode_tasmota_state,
    decode_tts_uplink,
    is_number,
)


def test_tasmota_sensor_flatten():
    payload = {
        "Time": "2024-01-01T00:00:00",
        "DS18B20": {"Id": "01", "Temperature": 21.5, "Type": "DS18B20"},
        "ENERGY": {"TotalStartTime": "x", "Power": 12, "Voltage": 230},
        "TempUnit": "C",
    }
    out = decode_tasmota_sensor(payload)
    assert out["Time"] == "2024-01-01T00:00:00"
    assert out["DS18B20.Temperature"] == 21.5
    assert out["ENERGY.Power"] == 12
    assert out["TempUnit"] == "C"
    assert "DS18B20.Type" not in out  # identification fields dropped


def test_tasmota_state_projection():
    payload = {
        "Time": "t", "Uptime": "1T00:00:00", "Heap": 26, "POWER": "ON",
        "Wifi": {"SSId": "net", "RSSI": 100, "Signal": -50, "Extra": "drop"},
        "NotProjected": 1,
    }
    out = decode_tasmota_state(payload)
    assert out["Heap"] == 26
    assert out["Wifi.RSSI"] == 100
    assert "NotProjected" not in out
    assert "Wifi.Extra" not in out


def test_sensor_community_pivot_and_coercion():
    payload = {
        "timestamp": "2024-01-01 00:00:00",
        "sensordatavalues": [
            {"value_type": "P1", "value": "8.32"},
            {"value_type": "samples", "value": "5026"},  # int whitelist
            {"value_type": "note", "value": "dusty"},  # non-numeric passthrough
        ],
    }
    out = decode_sensor_community(payload)
    assert out["P1"] == 8.32 and isinstance(out["P1"], float)
    assert out["samples"] == 5026 and isinstance(out["samples"], int)
    assert out["note"] == "dusty"


def test_tts_uplink_dynamic_gateway_keys():
    payload = {
        "end_device_ids": {"device_id": "dev-1"},
        "received_at": "2024-01-01T00:00:00Z",
        "uplink_message": {
            "decoded_payload": {"temperature": 22.5, "humidity": 60},
            "rx_metadata": [
                {"gateway_ids": {"gateway_id": "gw-a"}, "rssi": -70, "snr": 9.5},
                {"gateway_ids": {"gateway_id": "gw-b"}, "rssi": -90},
            ],
        },
    }
    out = decode_tts_uplink(payload)
    assert out["device_id"] == "dev-1"
    assert out["temperature"] == 22.5
    assert out["gw_gw-a_rssi"] == -70 and out["gw_gw-a_snr"] == 9.5
    assert out["gw_gw-b_rssi"] == -90 and "gw_gw-b_snr" not in out


def test_is_number_unicode():
    assert is_number("3.14") and is_number("42") and is_number(7)
    assert is_number("½")  # unicode numeric
    assert not is_number("abc") and not is_number(None)


def test_flatten_stage_batch():
    batch = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array(
                ['{"a": {"b": 1}, "c": 2}', "not json at all"], pa.string()
            ),
        }
    )
    out = FlattenStage("json", keep=("event_id",))(batch)
    rows = out.to_pylist()
    assert rows[0]["a.b"] == 1 and rows[0]["c"] == 2 and rows[0]["event_id"] == 1
    # malformed payload → null columns, event preserved
    assert rows[1]["event_id"] == 2 and rows[1].get("a.b") is None
