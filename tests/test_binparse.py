"""Binary snaplog decode + multi-line hop-log parse (ops/binparse.py):
header-declared offsets, type/length validation, deprecated-field skip,
and window-carried line state — the reference's two parser shapes
(web100 snaplog, .paris traceroute)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from etl_spark.ops.binparse import (
    _END_OF_HEADER,
    _decode_snaplog_batch,
    _encode_snaplogs,
)


def _events(n=7, uid=42):
    return pd.DataFrame(
        {
            "user_id": [uid] * n,
            "event_id": list(range(100, 100 + n)),
            "value": [1.25 * (i + 1) for i in range(n)],
            "event_type": ["click"] * n,
        }
    )


def test_roundtrip_identity():
    blob = _encode_snaplogs(_events())
    out = _decode_snaplog_batch(blob).reset_index(drop=True)
    assert list(out["seq"]) == list(range(100, 107))
    assert list(out["val_micro"]) == [int(np.floor(1.25 * (i + 1) * 1e6)) for i in range(7)]
    assert set(out["port"]) == {42}
    assert set(out["etype_len"]) == {5}
    assert "_junk" not in out.columns  # deprecated field skipped


def test_header_validation_rejects_bad_type_and_length():
    blob = bytes(_encode_snaplogs(_events())["snaplog"].iloc[0])
    hdr_end = blob.index(_END_OF_HEADER)
    # corrupt the declared type of the first field to an unknown code
    bad_type = blob.replace(b"seq 0 5 4\n", b"seq 0 99 4\n", 1)
    with pytest.raises(ValueError, match="invalid type"):
        _decode_snaplog_batch(pd.DataFrame({"user_id": [1], "snaplog": [bad_type]}))
    # corrupt the declared length so it contradicts the type table
    bad_len = blob.replace(b"seq 0 5 4\n", b"seq 0 5 2\n", 1)
    with pytest.raises(ValueError, match="invalid length"):
        _decode_snaplog_batch(pd.DataFrame({"user_id": [1], "snaplog": [bad_len]}))
    assert hdr_end > 0


def test_hoplog_state_carry(spark, tmp_path):
    """Continuation lines (no hop number) must inherit the hop of the
    last header line — the parser state the window carries."""
    import os

    from etl_spark.ops.binparse import txt_hoplog_parse

    ev = pd.DataFrame(
        {
            "event_id": list(range(9)),
            "ts": pd.to_datetime(["2024-01-01"] * 9).astype("datetime64[us]"),
            "user_id": [7] * 9,
            "event_type": ["click"] * 9,
            "value": [float(i) for i in range(9)],
            "props": ["{}"] * 9,
        }
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    ev.to_parquet(os.path.join(sf, "events.parquet"))
    out = txt_hoplog_parse(spark, sf).orderBy("probe_no").collect()
    assert [r["hop"] for r in out] == [1, 1, 1, 2, 2, 2, 3, 3, 3]
    assert all(r["protocol"] == "udp" for r in out)  # user 7 % 3 == 1 -> udp
    assert out[4]["node_ip"] == "10.0.0.4"
    assert [r["rtt_us"] for r in out] == [i * 1000 for i in range(9)]
