"""IMA ADPCM codec tests: encoder/decoder predictor-state parity,
waveform-tracking quality, clamp regimes, and a hypothesis fuzz —
engine↔oracle value equality for the registered query runs in
tests/test_oracle.py (the oracle replays the state machine in SQL)."""

from __future__ import annotations

import numpy as np

from depositaja_spark.functions.multimodal import (
    _adpcm_step,
    adpcm_decode,
    adpcm_encode,
)


def _replay_preds(samples):
    pred, idx, out = 0, 0, []
    for s in np.asarray(samples, np.int64).tolist():
        _, pred, idx = _adpcm_step(pred, idx, int(s))
        out.append(pred)
    return np.array(out, np.int64)


def test_decoder_equals_encoder_internal_state():
    """The decoded waveform must be exactly the encoder's internal
    predictor sequence — the invariant the SQL oracle relies on."""
    rng = np.random.RandomState(2)
    s = ((rng.randint(0, 256, 192) - 128) * 256).astype(np.int64)
    dec = adpcm_decode(adpcm_encode(s), 192)
    assert np.array_equal(dec, _replay_preds(s))


def test_sine_tracking_after_attack():
    """After the initial step-size ramp, a smooth waveform is tracked
    within a small fraction of its amplitude (the codec works, not just
    round-trips its own state)."""
    t = (np.sin(np.arange(400) / 10) * 8000).astype(np.int64)
    dec = adpcm_decode(adpcm_encode(t), 400)
    assert np.abs(dec[100:] - t[100:]).mean() < 200


def test_clamp_regimes():
    """Full-scale alternation exercises both predictor clamps and the
    step-index ceiling; state parity must hold throughout."""
    s = np.tile([32767, -32768], 100).astype(np.int64)
    dec = adpcm_decode(adpcm_encode(s), 200)
    assert np.array_equal(dec, _replay_preds(s))
    assert dec.max() <= 32767 and dec.min() >= -32768


def test_odd_length_padding():
    s = np.array([1000, -1000, 500], np.int64)
    enc = adpcm_encode(s)
    assert len(enc) == 2  # 3 nibbles + 1 pad
    assert np.array_equal(adpcm_decode(enc, 3), _replay_preds(s))


def test_adpcm_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=80, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=0,
            max_size=300,
        )
    )
    def check(samples):
        s = np.array(samples, np.int64)
        assert np.array_equal(
            adpcm_decode(adpcm_encode(s), len(s)), _replay_preds(s)
        )

    check()
