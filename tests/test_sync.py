"""Blind resynchronization search (eval/sync.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from image_in_speech_watermarking_tpu import data
from image_in_speech_watermarking_tpu.attacks import waveform as wf
from image_in_speech_watermarking_tpu.eval import sync


def test_length_restore_small_drift_uses_resample():
    wave = data.synthetic_speech(16000, seed=0)
    att = np.asarray(wf.jittering(jax.random.key(1), jnp.asarray(wave)))
    # jittering zero-fills the tail after deletion; model the received
    # signal as the compacted valid part
    att = att[: 16000 - 1000]
    cands = sync.resync_candidates(att, 16000)
    names = [n for n, _ in cands]
    assert any(n.startswith("resample") for n in names)
    for _, w in cands:
        assert w.shape == (16000,)


def test_length_restore_stretch_uses_vocoder_and_improves_alignment():
    wave = data.synthetic_speech(32000, seed=1)
    att = np.asarray(wf.time_scaling(jax.random.key(0), jnp.asarray(wave),
                                     scaling_factor=0.9))
    assert att.shape[-1] != 32000
    cands = dict(sync.resync_candidates(att, 32000))
    un = next(v for k, v in cands.items() if k.startswith("unstretch"))
    crop = cands["croppad"]

    # the inverse vocoder restores the spectral frame grid: magnitude-
    # spectrogram correlation with the original (what the STFT-domain
    # extractor sees; waveform phase is scrambled by the vocoder round
    # trip) must clearly beat naive crop/pad
    from image_in_speech_watermarking_tpu.dsp.stft import stft_ri

    def spec_corr(a, b):
        ma = np.linalg.norm(np.asarray(stft_ri(jnp.asarray(a), 255)),
                            axis=-1).ravel()
        mb = np.linalg.norm(np.asarray(stft_ri(jnp.asarray(b), 255)),
                            axis=-1).ravel()
        ma -= ma.mean(); mb -= mb.mean()
        return float(ma @ mb / (np.linalg.norm(ma) * np.linalg.norm(mb)
                                + 1e-9))

    assert spec_corr(un, wave) > spec_corr(crop, wave) + 0.1


def test_confidence_prefers_saturated_consistent_decodes():
    rng = np.random.default_rng(0)
    locked = np.tile((rng.random((1, 32, 32, 1)) > 0.5).astype(np.float32),
                     (4, 1, 1, 1))
    locked = np.clip(locked + 0.02 * rng.standard_normal(locked.shape),
                     0, 1)
    garbage = rng.random((4, 32, 32, 1)).astype(np.float32) * 0.5 + 0.25
    assert sync.confidence(locked) < sync.confidence(garbage)


def test_best_candidate_picks_aligned_input():
    wave = data.synthetic_speech(16000, seed=2)
    att = np.asarray(wf.time_scaling(jax.random.key(0), jnp.asarray(wave),
                                     scaling_factor=1.1))
    rng = np.random.default_rng(1)
    glyph = (rng.random((1, 32, 32, 1)) > 0.5).astype(np.float32)

    def extract(w):
        # toy extractor: decodes lock (saturated + consistent) only when
        # the input correlates with the embedded signal
        a = w - w.mean()
        b = wave - wave.mean()
        c = abs(float(np.dot(a, b) / (np.linalg.norm(a) *
                                      np.linalg.norm(b) + 1e-9)))
        noise = rng.standard_normal((4, 32, 32, 1)).astype(np.float32)
        return np.clip(np.tile(glyph, (4, 1, 1, 1)) * c
                       + (1 - c) * (0.5 + 0.2 * noise), 0, 1)

    _, dec, name, _ = sync.best_candidate(att, 16000, extract)
    assert name.startswith(("unstretch", "resample")), name
    # the winning decodes reproduce the glyph
    assert np.mean((dec > 0.5) != (glyph > 0.5)) < 0.2


def test_offset_search_recovers_exact_shift():
    wave = data.synthetic_speech(16000, seed=3)
    true_shift = 437
    att = np.roll(wave, true_shift)

    def extract(w):
        # toy zero-tolerance extractor: saturated decodes only at exact
        # sample alignment (mirrors the measured +-0 basin)
        aligned = float(np.allclose(w, wave))
        base = np.full((4, 32, 32, 1), 0.5, np.float32)
        return base + 0.49 * aligned

    off, dec, conf = sync.offset_search(att, extract, max_shift=512)
    assert off == true_shift
    assert conf < sync.LOCK_THRESHOLD


def _host_roll_fns(wave, extract):
    """Emulate the pipeline's device-roll scorers on host, for tests."""
    def score_rolls(offs):
        confs, sats = [], []
        for o in offs:
            d = np.asarray(extract(np.roll(wave, -int(o))))
            confs.append(sync.confidence(d))
            sats.append(np.mean(np.minimum(d, 1.0 - d), axis=(1, 2, 3)))
        return np.asarray(confs), np.stack(sats)

    def decode_rolls(offs):
        return np.stack([np.asarray(extract(np.roll(wave, -int(o))))
                         for o in offs])

    return score_rolls, decode_rolls


def test_lattice_search_rejects_hop_hallucination():
    """A hop-lattice impostor that OUT-SCORES the true offset on blind
    confidence must lose to the true offset on hop-stability (the
    measured flagship failure mode: true+8hops scored 0.0774 vs 0.0889
    at true, decode garbage)."""
    rng = np.random.default_rng(0)
    L, hop, true_shift = 16000, 63, 203
    wave = data.synthetic_speech(L, seed=6)
    att = np.roll(wave, true_shift)
    glyph = np.tile((rng.random((1, 32, 32, 1)) > 0.5).astype(np.float32),
                    (4, 1, 1, 1))
    glyph2 = np.tile((rng.random((1, 32, 32, 1)) > 0.5).astype(np.float32),
                     (4, 1, 1, 1))

    def extract(w):
        # roll error of this candidate wave vs the embedded signal;
        # the lock degrades gracefully for +-1 sample (like the real
        # decoder, so the stride-3 coarse crawl can find the basin) and
        # is hop-tolerant (same glyph at 0 and +-1 hop)
        for base in (0, hop, -hop):
            for err, slack in ((0, 0.01), (1, 0.04), (-1, 0.04)):
                if np.allclose(np.roll(w, base + err), wave):
                    return np.clip(glyph + slack, 0, 1 - slack)
        for err in (0, 1, -1):
            if np.allclose(np.roll(w, 8 * hop + err), wave):
                # hallucination at true+8hops: MORE saturated, different
                # glyph, not hop-stable
                return np.clip(glyph2 + 0.002, 0, 0.998)
        return np.full((4, 32, 32, 1), 0.5, np.float32)

    roll_fns = _host_roll_fns(att, extract)
    off, dec, conf, stab, conf_agrees = sync.lattice_offset_search(
        att, roll_fns, max_shift=768, block=64, hop=hop)
    assert off == true_shift, off
    assert stab <= sync.STABILITY_LOCK
    assert not conf_agrees  # the impostor won raw confidence
    np.testing.assert_allclose(dec, np.clip(glyph + 0.01, 0, 0.99))


def test_piecewise_roll_fns_matches_serial():
    wave = data.synthetic_speech(16000, seed=6)
    att = np.roll(wave, 203)

    def extract(w):
        aligned = float(np.allclose(w, wave))
        base = np.full((4, 32, 32, 1), 0.5, np.float32)
        return base + 0.49 * aligned

    roll_fns = _host_roll_fns(att, extract)
    dec_s, c_s = sync.piecewise_offset_search(att, extract,
                                              offsets=range(-8, 9, 2))
    dec_b, c_b = sync.piecewise_offset_search(
        att, extract, offsets=range(-8, 9, 2),
        roll_fns=roll_fns, block=4)
    np.testing.assert_allclose(dec_s, dec_b)
    assert c_s == c_b


def test_best_candidate_falls_back_to_offset_search():
    wave = data.synthetic_speech(16000, seed=4)
    att = np.asarray(wf.time_shift(jax.random.key(7), jnp.asarray(wave),
                                   max_shift=300))

    def extract(w):
        aligned = float(np.allclose(w, wave))
        base = np.full((4, 32, 32, 1), 0.5, np.float32)
        return base + 0.49 * aligned

    _, dec, name, conf = sync.best_candidate(att, 16000, extract,
                                             max_shift=320)
    assert "roll[" in name, name
    assert conf < sync.LOCK_THRESHOLD


def test_offset_search_not_anchored_on_pitch_candidate(monkeypatch):
    # regression: when no candidate locks, the roll search must anchor
    # on a roll-repairable candidate — NOT a pitch hypothesis that
    # happened to score marginally lower among garbage decodes
    wave = data.synthetic_speech(16000, seed=8)
    true_shift = 55
    att = np.roll(wave, true_shift)
    bait = np.asarray(data.synthetic_speech(16000, seed=9))

    def fake_candidates(a, L, **kw):
        if kw.get("stage") == "pitch":
            return [("pitch[+6]", bait)]
        return [("identity", a)]

    monkeypatch.setattr(sync, "resync_candidates", fake_candidates)

    def extract(w):
        if np.allclose(w, wave):                       # true repair
            return np.full((4, 32, 32, 1), 0.99, np.float32)
        if np.allclose(w, bait):                       # tempting garbage
            return np.full((4, 32, 32, 1), 0.34, np.float32)  # conf 0.34
        return np.full((4, 32, 32, 1), 0.5, np.float32)       # conf 0.5

    _, dec, name, conf = sync.best_candidate(att, 16000, extract,
                                             max_shift=64)
    assert name.startswith("identity") and "roll[" in name, name
    assert conf < sync.LOCK_THRESHOLD


def test_zero_tail_deletion_gets_resample_candidate():
    wave = data.synthetic_speech(16000, seed=5)
    att = np.asarray(wf.jittering(jax.random.key(2), jnp.asarray(wave),
                                  jit_ratio=1000))
    assert att.shape == (16000,)           # static shape, zero tail
    cands = sync.resync_candidates(att, 16000)
    names = [n for n, _ in cands]
    assert any(n.startswith("detail[") for n in names), names
    for _, w in cands:
        assert w.shape == (16000,)


def test_piecewise_offset_search_repairs_progressive_drift():
    # toy: 3 clips, each decodes (saturated) only at its own offset;
    # a probe impulse at index 0 lets the extractor recover the roll
    # the search applied
    true_offs = [0, 4, -6]
    L = 1024
    probe = np.zeros(L, np.float32)
    probe[0] = 1.0

    def ext(w):
        idx = int(np.argmax(w))
        off = (-idx) % L
        if off > L // 2:
            off -= L
        out = np.full((3, 32, 32, 1), 0.5, np.float32)
        for c, t in enumerate(true_offs):
            if off == t:
                out[c] = 0.99
        return out

    dec, conf = sync.piecewise_offset_search(probe, ext,
                                             offsets=range(-8, 9, 2))
    # every clip found its own offset -> all saturated
    assert float(np.mean(np.minimum(dec, 1 - dec))) < 0.02


def test_gated_piecewise_repair_fixes_only_unambiguous_clips():
    """A globally locked decode with a drifted minority: only clips
    whose re-search lands an unambiguous per-clip lock (< CLIP_ACCEPT)
    AND whose replacement decode is hop-stable are replaced; locked and
    aligned-but-noisy clips pass through, a weak (ambiguous) candidate
    is rejected by saturation, a hop-UNSTABLE impostor is rejected by
    CLIP_STABILITY, and an odd-offset drift is reached by the stride-1
    refinement around the coarse winner."""
    rng = np.random.default_rng(9)
    glyph_a = (rng.random((32, 32, 1)) > 0.5).astype(np.float32)
    glyph_b = (rng.random((32, 32, 1)) > 0.5).astype(np.float32)
    glyph_c = (rng.random((32, 32, 1)) > 0.5).astype(np.float32)
    locked = np.clip(glyph_a + 0.02, 0.0, 0.98)          # sat 0.02
    locked_b = np.clip(glyph_b + 0.03, 0.0, 0.97)        # sat 0.03
    locked_c = np.clip(glyph_c + 0.03, 0.0, 0.97)        # sat 0.03
    noisy = glyph_a * 0.78 + 0.11                        # sat 0.11
    weak = glyph_b * 0.78 + 0.11                         # sat 0.11
    garbage = np.full((32, 32, 1), 0.5, np.float32)
    hop = 63
    true_off = 24                                        # on the grid
    odd_off = 25                                         # off the grid

    def decode_rolls(offs):
        out = []
        for o in offs:
            o = int(o)
            c01 = locked if o == 0 else garbage
            # repairable: locked at true_off, and (like the measured real
            # decoder) hop-STABLE — the same glyph at true_off +- hop
            c2 = locked_b if o in (true_off, true_off + hop,
                                   true_off - hop) else garbage
            c3 = noisy if o == 0 else garbage            # aligned-noisy
            c4 = weak if o == -10 else garbage           # ambiguous
            # hop-lattice impostor: saturated wrong glyph at -12 but a
            # DIFFERENT decode one hop away (stability gate must reject)
            c5 = locked_b if o == -12 else (
                locked if o in (-12 + hop, -12 - hop) else garbage)
            # odd-sample drift: lock exists only at +25 (also hop-stable)
            c6 = locked_c if o in (odd_off, odd_off + hop,
                                   odd_off - hop) else garbage
            out.append(np.stack([c01, c01, c2, c3, c4, c5, c6]))
        return np.stack(out)

    def score_rolls(offs):
        d = decode_rolls(offs)
        sats = np.mean(np.minimum(d, 1.0 - d), axis=(2, 3, 4))
        return np.array([sync.confidence(x) for x in d]), sats

    dec0 = decode_rolls([0])[0]
    out, changed = sync.gated_piecewise_repair(
        dec0, (score_rolls, decode_rolls))
    assert changed
    np.testing.assert_array_equal(out[0], locked)        # untouched
    np.testing.assert_array_equal(out[2], locked_b)      # repaired
    np.testing.assert_array_equal(out[3], noisy)         # untouched
    np.testing.assert_array_equal(out[4], garbage)       # rejected (sat)
    np.testing.assert_array_equal(out[5], garbage)       # rejected (stab)
    np.testing.assert_array_equal(out[6], locked_c)      # odd-off repair

    # all-locked decode: identity fast path (no roll calls believed)
    all_locked = np.stack([locked] * 4)
    out2, changed2 = sync.gated_piecewise_repair(
        all_locked, (score_rolls, decode_rolls))
    assert out2 is all_locked and not changed2


# ---------------------------------------------------------------------------
# Mag-profile (round-4 |STFT| payload channel) — the landscape measured
# by scripts/r4_sync_calibration.py: a wide SMOOTH confidence bowl
# (radius >= 16, true offset = within-bowl argmin 0.0892, +-1 at
# 0.0948), a garbage floor that DIPS BELOW the bowl's own neighbours
# (min 0.0904), and hop-stability as the only separating signal (true
# 0.0039-0.0040 vs impostor 0.0085+ vs garbage >= 0.0295).
# ---------------------------------------------------------------------------

def _mag_world(true_shift, dip_m=None, L=16000, bowl=16, hop=63):
    """Toy extractor with the measured mag landscape. Returns
    (att, extract, bowl_glyph). ``dip_m`` places a hop-UNSTABLE garbage
    decode whose confidence (0.0875) undercuts the true offset's
    (0.089) at misalignment m = dip_m."""
    wave = data.synthetic_speech(L, seed=11)
    att = np.roll(wave, true_shift)
    rng = np.random.default_rng(3)
    glyph = np.tile((rng.random((1, 32, 32, 1)) > 0.5).astype(np.float32),
                    (4, 1, 1, 1))
    # byte-exact alignment lookup: every wave the search can produce is
    # a roll of `wave`; m is its residual misalignment
    lut = {np.roll(wave, m)[:64].tobytes(): m for m in range(-1400, 1401)}

    def rand_glyph(seed, slack):
        g = (np.random.default_rng(seed).random((1, 32, 32, 1))
             > 0.5).astype(np.float32)
        return np.clip(np.tile(g, (4, 1, 1, 1)) + slack, 0, 1 - slack)

    def extract(w):
        m = lut.get(np.asarray(w, np.float32)[:64].tobytes())
        if m is None:
            return rand_glyph(0, 0.17)
        for base in (0, hop, -hop):          # hop-tolerant, like the
            err = m - base                   # real mag decoder
            if abs(err) <= bowl:
                slack = 0.089 + 0.0004 * abs(err)
                return np.clip(glyph + slack, 0, 1 - slack)
        if dip_m is not None and m == dip_m:
            return rand_glyph(7, 0.0875)     # confident garbage dip
        return rand_glyph(m % (2 ** 31), 0.17)   # varying garbage
    return att, extract, np.clip(glyph + 0.089, 0, 1 - 0.089)


def test_mag_lattice_search_descends_wide_bowl_past_conf_dip():
    """The stride-1 descent must reach the bowl's argmin (the old
    dedup-8/refine-+-2 geometry left finalists mid-bowl and missed a
    true shift of 828), and the stability probe must reject a garbage
    dip whose raw confidence beats the true offset."""
    sync.set_profile("mag")
    try:
        true_shift = 828
        att, extract, bowl_glyph = _mag_world(true_shift, dip_m=-400)
        roll_fns = _host_roll_fns(att, extract)
        off, dec, conf, stab, _ = sync.lattice_offset_search(
            att, roll_fns, max_shift=1024, block=64)
        assert off == true_shift, off
        assert stab <= sync.STABILITY_LOCK
        np.testing.assert_allclose(dec, bowl_glyph)
    finally:
        sync.set_profile("ri")


def test_mag_best_candidate_stability_beats_confident_garbage():
    """time_shift repair under the mag profile: the identity decode is
    a hop-UNSTABLE garbage dip at conf 0.0875 — BELOW the true offset's
    0.089, so every confidence rule (lock gate, repair margin, final
    ranking) would keep the garbage. Stability rules must (1) refuse to
    declare the dip locked, (2) accept the true-offset repair without a
    confidence margin, (3) let the stability-verified repair outrank
    the lower-conf garbage."""
    sync.set_profile("mag")
    try:
        true_shift = 377
        # dip at m == true_shift: the UNROLLED attacked wave itself
        # decodes as confident garbage
        att, extract, bowl_glyph = _mag_world(true_shift,
                                              dip_m=true_shift)
        def make_roll_fns(wave):
            return _host_roll_fns(wave, extract)
        _, dec, name, conf = sync.best_candidate(
            att, 16000, extract, max_shift=512,
            make_roll_fns=make_roll_fns)
        assert "roll[" in name, name
        np.testing.assert_allclose(dec, bowl_glyph)
    finally:
        sync.set_profile("ri")


def test_mag_locked_decode_skips_repair_stages():
    """A hop-stable decode under LOCK_THRESHOLD is a verified lock: no
    roll search may rewrite it (and the pitch stage must not run)."""
    sync.set_profile("mag")
    try:
        att, extract, bowl_glyph = _mag_world(0)
        calls = {"n": 0}
        def counting_extract(w):
            calls["n"] += 1
            return extract(w)
        def make_roll_fns(wave):
            return _host_roll_fns(wave, counting_extract)
        _, dec, name, conf = sync.best_candidate(
            att, 16000, counting_extract, max_shift=512,
            make_roll_fns=make_roll_fns)
        np.testing.assert_allclose(dec, bowl_glyph)
        # identity candidates + one 3-offset lock probe + clipfix gate;
        # a full lattice crawl would be hundreds of calls
        assert calls["n"] < 40, calls["n"]
    finally:
        sync.set_profile("ri")


def test_set_profile_rebinds_and_restores():
    assert sync.STABILITY_LOCK == sync.RI_PROFILE.stability_lock
    sync.set_profile("mag")
    try:
        assert sync.STABILITY_LOCK == sync.MAG_PROFILE.stability_lock
        assert sync.CLIP_ACCEPT == sync.MAG_PROFILE.clip_accept
    finally:
        sync.set_profile("ri")
    assert sync.STABILITY_LOCK == sync.RI_PROFILE.stability_lock


def test_unstretch_prior_beats_garbage_coinflip(monkeypatch):
    # round-4b regression (scripts/r4_sync_probe.py): on a REAL stretch
    # (received length off by >> vocoder_threshold) where nothing locks,
    # the confidence differences between candidates are coin flips
    # inside the garbage band, and a pitch hypothesis at conf 0.1722
    # beat the physically-implied unstretch at 0.1811 even though the
    # unstretch decode was the better one (true MSE 0.0616 vs 0.0775).
    # The physical prior must return the unstretch decode unless some
    # other candidate beats it by REPAIR_MARGIN.
    L = 8000
    wave = data.synthetic_speech(L, seed=11)
    att = np.asarray(wf.time_stretch_wave(jnp.asarray(wave), 0.9))
    assert len(att) != L
    un_dec = np.full((4, 32, 32, 1), 0.30, np.float32)   # conf 0.30
    pitch_dec = np.full((4, 32, 32, 1), 0.29, np.float32)  # conf 0.29

    real_candidates = sync.resync_candidates

    def tagged_candidates(a, ln, **kw):
        return real_candidates(a, ln, **kw)

    monkeypatch.setattr(sync, "resync_candidates", tagged_candidates)

    def extract(w):
        cands = dict(real_candidates(att, L, stage="base"))
        un = [v for k, v in cands.items() if k.startswith("unstretch")][0]
        if w.shape == un.shape and np.allclose(w, un):
            return un_dec
        if len(w) == L and np.std(w) > 0 and not np.allclose(w[:64],
                                                             un[:64]):
            return pitch_dec        # every other candidate "wins" conf
        return pitch_dec

    _, dec, name, conf = sync.best_candidate(att, L, extract,
                                             max_shift=8)
    assert name.startswith("unstretch"), name
    assert np.allclose(dec, un_dec)


def test_unstretch_prior_yields_to_real_lock(monkeypatch):
    # the prior only arbitrates between GARBAGE candidates: a pitch
    # hypothesis that genuinely locks (conf < LOCK_THRESHOLD) keeps
    # winning over an unlocked unstretch decode
    L = 8000
    wave = data.synthetic_speech(L, seed=12)
    att = np.asarray(wf.time_stretch_wave(jnp.asarray(wave), 0.9))
    assert len(att) != L
    real_candidates = sync.resync_candidates
    locked_dec = np.full((4, 32, 32, 1), 0.99, np.float32)  # conf 0.01

    def fake_candidates(a, ln, **kw):
        if kw.get("stage") == "pitch":
            return [("pitch[+6]", np.zeros(L, np.float32))]
        return [c for c in real_candidates(a, ln, **kw)
                if c[0].startswith(("unstretch", "croppad"))]

    monkeypatch.setattr(sync, "resync_candidates", fake_candidates)

    def extract(w):
        if not np.any(w):
            return locked_dec
        return np.full((4, 32, 32, 1), 0.30, np.float32)

    _, dec, name, conf = sync.best_candidate(att, L, extract,
                                             max_shift=8)
    assert name.startswith("pitch"), name
    assert conf < sync.LOCK_THRESHOLD


def test_mag_roll_acceptance_requires_lock_band_conf():
    """Round-4c regression (scripts/r4_sync_probe.py, pitch row on pw2):
    a pitch-WARPED wave decodes hop-stable garbage at many offsets
    (finalist stabs 0.0037-0.0048, under the 0.006 gate), so a
    stability-only acceptance blessed a roll whose true MSE (0.113) was
    worse than plain identity (0.081). Every measured TRUE repair's
    confidence sits inside the lock band (0.0903-0.1179) and the warped
    garbage rolls outside it (0.1298+); the mag acceptance must require
    both. Here: every offset decodes the SAME garbage glyph (perfectly
    hop-stable) at conf ~0.16 — the roll stage must not accept it."""
    sync.set_profile("mag")
    try:
        L = 16000
        att = data.synthetic_speech(L, seed=21)
        frozen = np.clip(np.tile(
            (np.random.default_rng(5).random((1, 32, 32, 1)) > 0.5)
            .astype(np.float32), (4, 1, 1, 1)) + 0.16, 0, 0.84)

        def extract(w):
            return frozen                       # hop-stable everywhere

        def make_roll_fns(wave):
            return _host_roll_fns(wave, extract)

        _, dec, name, conf = sync.best_candidate(
            att, L, extract, max_shift=256, make_roll_fns=make_roll_fns)
        assert "+roll[" not in name, name
    finally:
        sync.set_profile("ri")


def test_pitch_sibling_degeneracy_tie_break(monkeypatch):
    """Round-4c regression (scripts/r4_pitch_probe.py, pw2 both
    utterances): the two pitch-inverse hypotheses' confidences are coin
    flips (gap 0.002-0.005, both in the garbage band), and the WRONG
    sibling (which doubles the warp) decodes a degenerately over-STABLE
    near-constant glyph (hop-stab 0.0027-0.0031 vs the true inverse's
    0.0044-0.0080). Within REPAIR_MARGIN of the conf argmin the stage
    must prefer the hop-RESPONSIVE sibling even when the degenerate one
    has marginally better confidence."""
    sync.set_profile("mag")
    try:
        L = 16000
        att = data.synthetic_speech(L, seed=22)
        rng = np.random.default_rng(9)
        true_wave = np.asarray(rng.normal(size=L), np.float32)
        wrong_wave = np.asarray(rng.normal(size=L), np.float32)
        # true sibling: structured decode, conf ~0.155, CHANGES under a
        # +-hop roll (responsive); wrong sibling: conf ~0.153 (wins the
        # coin flip) but identical decode at every roll (degenerate)
        glyph = np.tile((rng.random((1, 32, 32, 1)) > 0.5)
                        .astype(np.float32), (4, 1, 1, 1))
        wrong_dec = np.full((4, 32, 32, 1), 0.153, np.float32)

        def true_dec(off):
            jig = 0.02 * np.sin(off + np.arange(1024, dtype=np.float32)
                                ).reshape(1, 32, 32, 1) ** 2
            return np.clip(glyph + 0.155 + jig - 0.01, 0, 0.845)

        def which(w):
            if len(w) == L and np.allclose(w, true_wave):
                return "true"
            if len(w) == L and np.allclose(w, wrong_wave):
                return "wrong"
            return None

        def extract(w):
            kind = which(np.asarray(w))
            if kind == "true":
                return true_dec(0)
            if kind == "wrong":
                return wrong_dec
            return np.clip(glyph + 0.18, 0, 0.82)   # garbage elsewhere

        real_candidates = sync.resync_candidates

        def fake_candidates(a, ln, **kw):
            if kw.get("stage") == "pitch":
                return [("pitch[+6]", true_wave),
                        ("pitch[-6]", wrong_wave)]
            return [c for c in real_candidates(a, ln, **kw)]

        monkeypatch.setattr(sync, "resync_candidates", fake_candidates)

        def make_roll_fns(wave):
            kind = which(np.asarray(wave))

            def decode_rolls(offs):
                if kind == "true":
                    return np.stack([true_dec(int(o)) for o in offs])
                if kind == "wrong":
                    return np.stack([wrong_dec for _ in offs])
                return np.stack([extract(np.roll(wave, -int(o)))
                                 for o in offs])

            def score_rolls(offs):
                d = decode_rolls(offs)
                sats = np.mean(np.minimum(d, 1.0 - d), axis=(2, 3, 4))
                return (np.asarray([sync.confidence(x) for x in d]),
                        sats)

            return score_rolls, decode_rolls

        _, dec, name, conf = sync.best_candidate(
            att, L, extract, max_shift=64, make_roll_fns=make_roll_fns)
        assert name == "pitch[+6]", name
    finally:
        sync.set_profile("ri")
