"""Property tests (hypothesis): the from-scratch media codecs must hold
their invariants on ARBITRARY inputs, not just the synthesis formulas the
oracle rows use.

* FLAC — true losslessness: decode(encode(x)) == x for any int16 signal
  (constant signals drive the Rice parameter to 0; adversarial ramps
  maximize order-2 residuals at ±4·32768 — both inside the subset).
* JPEG — the oracle-gating property itself: decode(encode(img)) equals
  the pinned integer forward+inverse replay for any uint8 plane. If any
  Huffman/bit-layer bug ever corrupted a coefficient, this is the test
  that finds the plane where it shows.
* AVI — container transparency: the MJPEG frames come back exactly as
  the per-frame JPEG replay, whatever the frame planes are.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from the_yelp_collaborative_knowledge_graph_ray.stages import media_codecs as mc

i16 = st.integers(-32768, 32767)


@given(xs=st.lists(i16, min_size=4, max_size=400))
@settings(max_examples=30, deadline=None)
def test_flac_roundtrip_lossless_any_signal(xs):
    x = np.asarray(xs, np.int16)
    payload = mc._flac_encode(x)
    assert np.array_equal(mc._flac_decode(payload), x.astype(np.int64))


@given(seed=st.integers(0, 2**32 - 1),
       lo=st.integers(0, 200), hi=st.integers(55, 255))
@settings(max_examples=30, deadline=None)
def test_jpeg_entropy_layer_transparent_any_plane(seed, lo, hi):
    rng = np.random.RandomState(seed)
    a, b = min(lo, hi), max(lo, hi) + 1
    img = rng.randint(a, b, (mc.JPEG_H, mc.JPEG_W)).astype(np.uint8)
    dec = mc._jpeg_decode(mc._jpeg_encode(img))
    ref = mc._jpeg_decode_plane(mc._jpeg_quant_coeffs(img))
    assert np.array_equal(dec, ref)


@given(seed=st.integers(0, 2**32 - 1), n_frames=st.integers(1, 5))
@settings(max_examples=10, deadline=None)
def test_avi_container_transparent_any_frames(seed, n_frames):
    rng = np.random.RandomState(seed)
    planes = [rng.randint(0, 256, (mc.JPEG_H, mc.JPEG_W)).astype(np.uint8)
              for _ in range(n_frames)]
    # splice arbitrary planes into the synth path via the frame hooks
    # (manual patch + restore: hypothesis forbids function-scoped
    # monkeypatch fixtures)
    import the_yelp_collaborative_knowledge_graph_ray.stages.media_codecs as m
    saved = (m._avi_n_frames, m._avi_frame_pixels)
    try:
        m._avi_n_frames = lambda mid: n_frames
        m._avi_frame_pixels = lambda mid, f: planes[f]
        payload = m._avi_encode(0)
    finally:
        m._avi_n_frames, m._avi_frame_pixels = saved
    frames = m._avi_decode(payload)
    assert len(frames) == n_frames
    for f, img in enumerate(planes):
        ref = m._jpeg_decode_plane(m._jpeg_quant_coeffs(img))
        assert np.array_equal(frames[f], ref)
