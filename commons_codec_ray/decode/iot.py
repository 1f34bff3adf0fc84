"""Telemetry payload decoders (the reference's ``decode/`` family),
re-expressed as flatten kernels usable inside ``map_batches``.

- Tasmota sensor/state decoders (reference decode/tasmota.py:22-150):
  nested device JSON → flat dotted-path dict; drops ``Type``/``Address``
  identification fields; wildcards over dynamic sensor names.
- Sensor.Community (reference decode/sensor_community.py:77-94):
  list-of-{value_type,value} → flat dict with numeric coercion and an
  int whitelist.
- The Things Stack / The Things Network uplinks (reference
  decode/tts_ttn.py:29-73): device id + timestamp + decoded payload +
  per-gateway RSSI/SNR dynamic keys.

All decoders output flat ``OrderedDict``-style dicts whose keys become
wide Arrow columns after ``pa.Table.from_pylist`` in the batch wrapper
(:func:`flatten_stage`).
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa

# ---------------------------------------------------------------------------
# generic helpers
# ---------------------------------------------------------------------------


def is_number(s: Any) -> bool:
    """Numeric-string predicate incl. unicode numerics (ref util/data.py:11-32)."""
    if isinstance(s, (int, float)):
        return True
    if not isinstance(s, str):
        return False
    try:
        float(s)
        return True
    except ValueError:
        pass
    try:
        import unicodedata

        unicodedata.numeric(s)
        return True
    except (TypeError, ValueError):
        return False


def flatten_dotted(obj: Any, prefix: str = "", drop: frozenset = frozenset()) -> dict[str, Any]:
    """Nested dict → flat dotted-path dict, dropping ``drop``-named keys."""
    out: dict[str, Any] = {}
    if isinstance(obj, dict):
        for k, v in obj.items():
            if k in drop:
                continue
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flatten_dotted(v, path, drop))
            else:
                out[path] = v
    return out


# ---------------------------------------------------------------------------
# Tasmota
# ---------------------------------------------------------------------------

_TASMOTA_DROP = frozenset({"Type", "Address"})  # identification fields dropped
# (ref decode/tasmota.py drops sensor Type/Address from readings)


def decode_tasmota_sensor(payload: dict) -> dict[str, Any]:
    """SENSOR telemetry → flat dotted readings (ref decode/tasmota.py:22-112).

    Keeps ``Time``; every nested sensor section (ENERGY, DS18B20, ANALOG,
    wildcard names) flattens to ``Section.Field``; ``TempUnit`` and other
    scalar roots pass through.
    """
    out: dict[str, Any] = {}
    for key, value in payload.items():
        if isinstance(value, dict):
            out.update(flatten_dotted(value, key, _TASMOTA_DROP))
        else:
            out[key] = value
    return out


_TASMOTA_STATE_FIELDS = (
    "Time", "Uptime", "UptimeSec", "Heap", "SleepMode", "Sleep", "LoadAvg",
    "MqttCount", "POWER", "Dimmer", "Fade", "Speed", "LedTable",
)
_TASMOTA_STATE_WIFI = ("AP", "SSId", "BSSId", "Channel", "Mode", "RSSI", "Signal", "LinkCount", "Downtime")


def decode_tasmota_state(payload: dict) -> dict[str, Any]:
    """STATE telemetry → fixed field-path projection (ref decode/tasmota.py:115-150)."""
    out: dict[str, Any] = {}
    for f in _TASMOTA_STATE_FIELDS:
        if f in payload:
            out[f] = payload[f]
    wifi = payload.get("Wifi", {})
    for f in _TASMOTA_STATE_WIFI:
        if f in wifi:
            out[f"Wifi.{f}"] = wifi[f]
    return out


# ---------------------------------------------------------------------------
# Sensor.Community
# ---------------------------------------------------------------------------

# value_types that stay integers (ref decode/sensor_community.py:70-75)
SENSOR_COMMUNITY_INT_TYPES = frozenset(
    {"samples", "min_micro", "max_micro", "interval", "signal"}
)


def decode_sensor_community(payload: dict) -> dict[str, Any]:
    """{sensordatavalues: [{value_type, value}, ...]} → flat dict with
    numeric coercion (ref decode/sensor_community.py:77-94)."""
    out: dict[str, Any] = {}
    if "timestamp" in payload:
        out["timestamp"] = payload["timestamp"]
    for item in payload.get("sensordatavalues", []):
        vt, v = item.get("value_type"), item.get("value")
        if vt is None:
            continue
        if isinstance(v, str) and is_number(v):
            v = int(float(v)) if vt in SENSOR_COMMUNITY_INT_TYPES else float(v)
        out[vt] = v
    return out


# ---------------------------------------------------------------------------
# The Things Stack / The Things Network
# ---------------------------------------------------------------------------


def decode_tts_uplink(payload: dict) -> dict[str, Any]:
    """Uplink message → device id/timestamp/decoded payload + per-gateway
    RSSI/SNR dynamic keys (ref decode/tts_ttn.py:29-73)."""
    out: dict[str, Any] = {}
    ids = payload.get("end_device_ids", {})
    out["device_id"] = ids.get("device_id")
    out["received_at"] = payload.get("received_at")
    msg = payload.get("uplink_message", {})
    decoded = msg.get("decoded_payload", {})
    for k, v in decoded.items():
        out[k] = v
    for gw in msg.get("rx_metadata", []):
        gw_id = gw.get("gateway_ids", {}).get("gateway_id", "unknown")
        if "rssi" in gw:
            out[f"gw_{gw_id}_rssi"] = gw["rssi"]
        if "snr" in gw:
            out[f"gw_{gw_id}_snr"] = gw["snr"]
    return out


# ---------------------------------------------------------------------------
# batch wrapper
# ---------------------------------------------------------------------------

def decode_json_flat(payload: dict) -> dict[str, Any]:
    """Generic JSON → flat dotted-path dict (M16-style helper)."""
    return flatten_dotted(payload)


DECODERS = {
    "tasmota_sensor": decode_tasmota_sensor,
    "tasmota_state": decode_tasmota_state,
    "sensor_community": decode_sensor_community,
    "tts_uplink": decode_tts_uplink,
    "json": decode_json_flat,
}


class FlattenStage:
    """map_batches stage: JSON payload column → wide flat columns.

    ``decoder`` picks the payload grammar; unknown/missing fields become
    nulls via ``pa.Table.from_pylist`` schema inference over the batch.
    Stateful-class form so the decoder lookup and json parser bind once
    per actor.
    """

    def __init__(self, decoder: str, payload_column: str = "payload", keep: tuple = ()):
        self.decode = DECODERS[decoder]
        self.payload_column = payload_column
        self.keep = keep
        try:
            import orjson

            self.loads = orjson.loads
        except ImportError:  # pragma: no cover
            self.loads = json.loads

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_column].to_pylist()
        kept = {k: batch[k].to_pylist() for k in self.keep}
        rows = []
        for i, p in enumerate(payloads):
            try:
                d = self.decode(self.loads(p) if isinstance(p, (str, bytes)) else p)
            except Exception:  # noqa: BLE001 — malformed telemetry → null row
                d = {}
            for k, vals in kept.items():
                d[k] = vals[i]
            rows.append(d)
        return pa.Table.from_pylist(rows)
