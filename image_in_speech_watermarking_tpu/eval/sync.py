"""Extraction-side resynchronization for desynchronizing attacks.

The extractor (like the reference's, audio_test.py:676-712) reads the
attacked waveform on a fixed 128-frame STFT chunk grid, so attacks that
warp the time base — jittering (sample deletion), time_scaling (phase-
vocoder stretch), pitch_scaling (stretch + resample) — defeat it even
though the watermark energy is still present (round-2 sweep: WM-MSE
0.07-0.13 ≈ trivial-predictor level on those three rows).

This module restores the grid BEFORE extraction, blindly:

1. Length restore. If the received length differs from the embedded
   length, the time base was warped globally; invert it. Near-unity
   ratios (jitter deletions, a fraction of a percent) are corrected
   with a linear-phase resample (pitch error negligible); larger ratios
   (time_scaling 0.9/1.1) with the inverse phase-vocoder stretch, which
   restores the spectral frame alignment the vocoder attack moved.
2. Candidate dictionary. Warps that preserve length (pitch_scaling)
   cannot be detected from the length; a small dictionary of inverse
   warps (identity, pitch ∓6 st — the battery's operating points) is
   tried and the winner chosen by a BLIND confidence score on the
   decoded watermarks themselves:
     - saturation: decoded glyphs/bit-images are sigmoid outputs that
       sit near {0,1} when decoding locks; mean min(w, 1-w) measures it
     - cross-clip agreement: every clip of an utterance carries the
       SAME message, so the mean per-pixel variance across clips is a
       decoder-independent lock indicator
   Neither term uses the original audio or the true message.

The reference has no equivalent (it simply fails on these rows); the
sync search matches its grid-alignment architecture (audio_test.py:
676-712) but repairs the grid first.
"""

from __future__ import annotations

import dataclasses
import os
import sys
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _dbg(msg: str) -> None:
    """Search diagnostics behind ISW_SYNC_DEBUG=1 (threshold
    recalibration needs the internal scores, not just the aggregate)."""
    if os.environ.get("ISW_SYNC_DEBUG"):
        print(f"[sync] {msg}", file=sys.stderr, flush=True)

from image_in_speech_watermarking_tpu.attacks.waveform import (
    pitch_scaling, time_stretch_wave)

__all__ = ["resync_candidates", "confidence", "best_candidate"]


def _linear_resample(wav: np.ndarray, out_len: int) -> np.ndarray:
    """Linear-interp resample of a 1-D wave to ``out_len`` samples."""
    L = wav.shape[-1]
    pos = np.linspace(0.0, L - 1.0, out_len)
    return np.interp(pos, np.arange(L), wav).astype(np.float32)


def resync_candidates(att_audio: np.ndarray, expected_len: int,
                      pitch_steps: Tuple[float, ...] = (6.0, -6.0),
                      vocoder_threshold: float = 0.02,
                      stage: str = "all",
                      ) -> List[Tuple[str, np.ndarray]]:
    """Candidate re-aligned waveforms (name, wave), all ``expected_len``
    samples. Always includes the raw (length-fixed) signal first.

    ``stage``: "base" skips the pitch hypotheses, "pitch" synthesizes
    only them — the pitch inverse runs a host phase vocoder (~1 min per
    utterance on this 1-vCPU host), so the production search evaluates
    the cheap candidates first and synthesizes pitch hypotheses only
    when nothing locks (best_candidate stages)."""
    att = np.asarray(att_audio, np.float32).reshape(-1)
    L = att.shape[-1]
    cands: List[Tuple[str, np.ndarray]] = []

    # The inverse warps run the phase vocoder, whose complex math
    # (mag * exp(i*phase)) is UNIMPLEMENTED on the TPU backend; run the
    # candidate synthesis on the host CPU backend like the eval chain's
    # attack application (pipeline.py), exact-length and compile-free.
    with jax.default_device(jax.devices("cpu")[0]):
        if L == expected_len:
            cands.append(("identity", att))
            # Deletion attacks in the static-shape battery keep the
            # length and zero-fill the tail (waveform.jittering): the
            # survivors are left-shifted with progressively growing
            # drift. Blind tell: an exact-zero tail run. Trim it and
            # linear-resample the survivors back to the full grid —
            # the same repair as a short received signal.
            zero_tail = int(np.argmax(att[::-1] != 0.0)) \
                if np.any(att != 0.0) else 0
            if zero_tail >= 64:
                trimmed = att[: L - zero_tail]
                cands.append((f"detail[{zero_tail}]",
                              _linear_resample(trimmed, expected_len)))
        else:
            rate = L / float(expected_len)
            if abs(rate - 1.0) < vocoder_threshold:
                # small global drift (jitter deletions): linear resample —
                # the implied pitch change is < 2 percent of a semitone-
                # free ratio, far inside the decoder's tolerance
                cands.append((f"resample[{rate:.4f}]",
                              _linear_resample(att, expected_len)))
            else:
                # a real stretch: undo with the inverse phase vocoder so
                # spectral frames (not just samples) realign
                out = np.asarray(time_stretch_wave(jnp.asarray(att), rate))
                out = _fix_len(out, expected_len)
                cands.append((f"unstretch[{rate:.4f}]", out))
                # fallback: plain resample (covers resample-style
                # stretches)
                cands.append((f"resample[{rate:.4f}]",
                              _linear_resample(att, expected_len)))
            # raw crop/pad candidate in case the change was trimming
            cands.append(("croppad", _fix_len(att, expected_len)))

        if stage != "base":
            base = cands[0][1] if cands else _fix_len(att, expected_len)
            for steps in pitch_steps:
                # inverse of the battery's pitch_scaling(n_steps=-steps)
                out = np.asarray(pitch_scaling(
                    jax.random.key(0), jnp.asarray(base),
                    scaling_factor=float(steps)))
                cands.append((f"pitch[{steps:+.0f}]",
                              _fix_len(out, expected_len)))
    if stage == "pitch":
        cands = [c for c in cands if c[0].startswith("pitch[")]
    return cands


def _fix_len(wav: np.ndarray, n: int) -> np.ndarray:
    wav = wav[..., :n]
    if wav.shape[-1] < n:
        wav = np.pad(wav, (0, n - wav.shape[-1]))
    return wav.astype(np.float32)


# ---------------------------------------------------------------------------
# In-band pilot (round 5): when the checkpoint was trained with
# data.watermark.stamp_pilot, every decode carries a KNOWN pattern in
# its corner and alignment evidence becomes "does the pilot decode?" —
# a calibrated, per-clip, model-independent signal that replaces the
# blind saturation/stability gates (VERDICT r4 next-step #4). Activated
# by set_pilot(); all scorers (host + device, global + per-clip) then
# measure pilot-region MSE instead of the blind composite.

_PILOT: Optional[np.ndarray] = None


def set_pilot(pattern: Optional[np.ndarray]) -> None:
    """Activate pilot-driven scoring (None deactivates). The eval CLI
    calls this for --wm_pilot checkpoints, alongside set_profile('pilot')."""
    global _PILOT
    _PILOT = None if pattern is None else np.asarray(pattern, np.float32)


def get_pilot() -> Optional[np.ndarray]:
    return _PILOT


def pilot_error(decodes: np.ndarray) -> float:
    """Mean squared error of the decoded pilot region vs the known
    pattern, averaged over clips — lower is better. Aligned decodes sit
    at the clean WM-MSE level; misaligned garbage decodes a ~0.5-mean
    blur against a {0,1} pattern (~0.25)."""
    w = np.asarray(decodes, np.float32)
    ph, pw = _PILOT.shape
    return float(np.mean((w[..., :ph, :pw, 0] - _PILOT) ** 2))


def _per_clip_score(w: np.ndarray) -> np.ndarray:
    """(n, 32, 32, 1) -> (n,) per-clip lock score: pilot-region MSE when
    the pilot is active, blind saturation otherwise."""
    w = np.asarray(w, np.float32)
    if _PILOT is not None:
        ph, pw = _PILOT.shape
        return np.mean((w[:, :ph, :pw, 0] - _PILOT) ** 2, axis=(1, 2))
    return np.mean(np.minimum(w, 1.0 - w), axis=(1, 2, 3))


def confidence(decodes: np.ndarray) -> float:
    """Lock score for per-clip watermark decodes (n, 32, 32, 1) — lower
    is better. Pilot-region MSE when a pilot is active (direct evidence);
    otherwise the blind saturation + cross-clip variance composite (see
    module doc)."""
    if _PILOT is not None:
        return pilot_error(decodes)
    w = np.asarray(decodes, np.float32)
    saturation = float(np.mean(np.minimum(w, 1.0 - w)))
    agreement = float(np.mean(np.var(w, axis=0))) if w.shape[0] > 1 else 0.0
    return saturation + 2.0 * agreement


# Confidence below this = the decoder probably locked (measured on the
# round-3 flagship: aligned ~0.065-0.09 clean, ~0.122 when the decode is
# correct but noisy (awgn-15 at WM-MSE 0.036); misaligned garbage is
# USUALLY >= 0.16 but can dip to ~0.13, so the locked/garbage bands
# OVERLAP in 0.12-0.13 — no single threshold separates them. Hence two
# constants: LOCK_THRESHOLD gates whether a repair search runs at all,
# and the stricter ACCEPT_THRESHOLD is the only score the search may
# early-exit on (an unambiguous lock); between them, a repair must beat
# the anchor by REPAIR_MARGIN to be believed (protects an aligned-but-
# noisy decode from a confidently-wrong roll that scores 0.01 lower).
# The decoder's alignment basin is exactly +-0 samples — a 1-sample
# shift rotates every n_fft=255 bin's phase and the RI embedding is
# gone.
LOCK_THRESHOLD = 0.12
# The stage-B flagship was TRAINED with a time_shift-16 branch, so it
# decodes confidently at spurious offsets too (measured: a wrong roll
# scored 0.0922 while the true offset scored 0.0647 on the same
# utterance). 0.08 exits early only on unambiguous locks; anything
# weaker crawls the whole window and takes the global confidence
# minimum, which the measurements show sits at the true offset.
ACCEPT_THRESHOLD = 0.08
REPAIR_MARGIN = 0.02
# Per-clip repair gates (gated_piecewise_repair): a GLOBALLY locked
# decode can still carry individually drifted clips (deletion repair
# restores the global grid, the residual per-clip walk misaligns a
# minority of clips — the jittering-1000 headline row aggregated to
# 0.066 this way: most clips at ~0.003, a drifted minority at garbage
# level, global confidence under LOCK_THRESHOLD so no repair stage
# ran). Per-clip saturation separates the populations (locked clips
# ~0.06-0.09, aligned-but-noisy ~0.12, misaligned garbage >= 0.13), so
# clips above CLIP_UNLOCKED get an individual offset search and a
# replacement is believed only if it lands BELOW CLIP_ACCEPT (an
# unambiguous per-clip lock) and improves by CLIP_MARGIN — locked clips
# are never touched, and a noisy-but-aligned clip cannot be stolen by a
# saturation-hacked wrong offset (those never reach 0.10).
CLIP_UNLOCKED = 0.12
CLIP_ACCEPT = 0.10
CLIP_MARGIN = 0.02
# Per-clip hop-stability gate (gated_piecewise_repair): saturation alone
# cannot reject hop-lattice impostors — a clip drifted >= 15 samples has
# an impostor offset (d -+ 63) inside the +-48 search grid that decodes a
# STABLE wrong glyph under CLIP_ACCEPT (the measured 0.0774-confidence
# impostors of the STABILITY_LOCK note sit below the 0.10 gate). So an
# accepted per-clip replacement must ALSO be invariant to a further +-1
# hop roll, like the global search's finalists. The per-clip threshold is
# looser than the global STABILITY_LOCK (0.0025, a mean over all clips)
# because a single clip's stability is one sample of that mean: measured
# on the jittering-1000 probe, true-offset clips sit at 0.0005-0.0028 and
# impostor clips at >= 0.0060.
CLIP_STABILITY = 0.0045

# Hop-lattice hallucinations: offsets that differ from the true shift
# by exact multiples of the eval STFT hop (63 samples) shift the
# spectrogram by whole frames, and the extractor then decodes a STABLE
# WRONG glyph with confidence rivalling the true offset (measured:
# +349 = true+8 hops scored 0.0774 vs 0.0889 at the true offset, decode
# garbage). The discriminator confidence cannot see: only the TRUE
# offset's decode is invariant to a further +-1 hop roll
# (stability 0.0010-0.0012 at true vs 0.0034-0.0079 at every impostor,
# measured on both probe utterances). A roll repair is only believed if
# its hop-stability clears this gate.
STABILITY_LOCK = 0.0025

# ---------------------------------------------------------------------------
# Sync profiles: every constant above was measured on the round-3
# real/imag flagship, whose alignment basin is sample-exact and whose
# confidence bands separate locked (~0.065-0.09) from garbage
# (>= 0.13). The round-4 |STFT| payload channel (UformerConfig.
# extractor_mag) has a COMPLETELY different landscape, measured by
# scripts/r4_sync_calibration.py on both probe utterances:
#
#   true offset conf   0.0892-0.0898   (within-bowl argmin)
#   bowl +-1..16       0.0917-0.0970   (wide SMOOTH bowl; +-31 is out
#                                        at 0.179-0.188)
#   hop impostors      0.1016-0.1049 (+-63), 0.1187-0.1436 (+-126)
#   background garbage min 0.0904-0.0962, median 0.166-0.178
#   hop-stability      true 0.0039-0.0040, impostor 0.0085-0.0119,
#                      garbage >= 0.0295
#
# Confidence CANNOT make any decision alone for this model: the garbage
# floor (0.0904) sits BELOW the bowl's own +-1 neighbours (0.0948), so a
# conf-gated "locked, skip repair" verdict can bless a garbage decode
# and a conf-ranked argmin can pick garbage over near-true offsets
# (observed: the r3-tuned search picked 754 for a true shift of 828).
# Hop-stability separates with ~2x headroom on both sides, so the mag
# profile makes stability the deciding signal everywhere: a lock verdict
# must be stability-verified, a roll repair is accepted iff its winner
# is hop-stable, and the basin search matches the wide-bowl geometry
# (coarse stride 5 cannot step over a radius>=16 bowl; each basin is
# descended to its stride-1 argmin before the stability probe — the old
# dedup-8/refine-+-2 geometry left finalists mid-bowl).


@dataclasses.dataclass(frozen=True)
class SyncProfile:
    name: str
    lock: float                 # LOCK_THRESHOLD
    roll_accept: float          # conf ceiling for a stability-verified roll
    accept: float               # ACCEPT_THRESHOLD
    repair_margin: float
    clip_unlocked: float
    clip_accept: float
    clip_margin: float
    clip_stability: float
    stability_lock: float
    coarse_stride: int          # lattice_offset_search crawl stride
    basin_radius: int           # basin dedup radius (bowl half-width)
    descent: Tuple[int, ...]    # per-basin refinement deltas
    stability_rules: bool       # stability decides lock + acceptance


RI_PROFILE = SyncProfile(
    name="ri", lock=0.12, roll_accept=0.12, accept=0.08, repair_margin=0.02,
    clip_unlocked=0.12, clip_accept=0.10, clip_margin=0.02,
    clip_stability=0.0045, stability_lock=0.0025,
    coarse_stride=3, basin_radius=8, descent=(-2, -1, 1, 2),
    stability_rules=False)

# Pilot profile: scores are pilot-region MSE (direct evidence, see
# set_pilot). An aligned decode's pilot error sits at the clean WM-MSE
# level (0.002 clean, <=0.05 noisy-but-aligned); garbage decodes a
# ~0.5-mean blur against the {0,1} pattern (~0.25) and hop impostors
# decode a WRONG glyph whose pilot corner is wrong too — so one
# threshold separates what the blind profiles needed stability probes
# for, and stability_rules stays off. Search geometry copies the mag
# profile (same wide alignment bowl: the pilot rides the same
# |STFT|-channel extractor). Constants provisional until calibrated on
# the pilot fine-tune (scripts/r4_sync_calibration.py protocol).
PILOT_PROFILE = SyncProfile(
    name="pilot", lock=0.08, roll_accept=0.08, accept=0.04,
    repair_margin=0.03,
    clip_unlocked=0.08, clip_accept=0.06, clip_margin=0.02,
    clip_stability=0.0065, stability_lock=0.006,
    coarse_stride=5, basin_radius=16,
    descent=(-14, -11, -8, -6, -4, -3, -2, -1, 1, 2, 3, 4, 6, 8, 11, 14),
    stability_rules=False)

# roll_accept: the measured TRUE repairs' conf (time_shift 0.0903,
# jittering deletion 0.1179) vs the warped-garbage rolls (0.1298-0.1336)
# leave only 0.002 headroom if the gate reuses lock=0.12 — per-utterance
# variance could push a true deletion repair over it. 0.124 is the
# midpoint of the measured bands (0.006 margin to true, 0.006 to
# garbage).
MAG_PROFILE = SyncProfile(
    name="mag", lock=0.12, roll_accept=0.124, accept=0.05,
    repair_margin=0.02,
    clip_unlocked=0.12, clip_accept=0.115, clip_margin=0.02,
    clip_stability=0.0065, stability_lock=0.006,
    coarse_stride=5, basin_radius=16,
    descent=(-14, -11, -8, -6, -4, -3, -2, -1, 1, 2, 3, 4, 6, 8, 11, 14),
    stability_rules=True)

_PROFILE = RI_PROFILE


def set_profile(name: str) -> SyncProfile:
    """Select the sync constant profile ('ri' or 'mag') and rebind the
    module-level constants so existing callers/tests see the active
    values. The eval CLI selects 'mag' for --extractor_mag checkpoints."""
    global _PROFILE, LOCK_THRESHOLD, ACCEPT_THRESHOLD, REPAIR_MARGIN, \
        CLIP_UNLOCKED, CLIP_ACCEPT, CLIP_MARGIN, CLIP_STABILITY, \
        STABILITY_LOCK
    prof = {"ri": RI_PROFILE, "mag": MAG_PROFILE,
            "pilot": PILOT_PROFILE}[name]
    _PROFILE = prof
    LOCK_THRESHOLD = prof.lock
    ACCEPT_THRESHOLD = prof.accept
    REPAIR_MARGIN = prof.repair_margin
    CLIP_UNLOCKED = prof.clip_unlocked
    CLIP_ACCEPT = prof.clip_accept
    CLIP_MARGIN = prof.clip_margin
    CLIP_STABILITY = prof.clip_stability
    STABILITY_LOCK = prof.stability_lock
    return prof


def _outward_offsets(max_shift: int):
    """0, +1, -1, +2, -2, ... +-max_shift."""
    yield 0
    for mag in range(1, max_shift + 1):
        yield mag
        yield -mag


def offset_search(wave: np.ndarray, extract_fn, max_shift: int = 1024,
                  accept: float = ACCEPT_THRESHOLD,
                  ) -> Tuple[int, np.ndarray, float]:
    """Exact integer-offset search (serial form): circularly roll
    ``wave`` by every offset in [-max_shift, max_shift] (outward from 0)
    and return the best (offset, decodes, confidence) by the blind lock
    score, early-exiting only on an unambiguous lock (``accept``).

    The decoder's alignment basin is sample-exact (see LOCK_THRESHOLD
    note), so the search must visit every integer offset. Repairs
    constant-offset desyncs (time_shift) exactly; also used as a +-small
    refinement after a global length restore. The production eval path
    uses ``lattice_offset_search`` instead (device-roll blocks +
    hop-stability verification)."""
    best = None
    for off in _outward_offsets(max_shift):
        dec = extract_fn(np.roll(wave, -off))
        c = confidence(dec)
        if best is None or c < best[2]:
            best = (off, dec, c)
        if c < accept:
            return best
    return best


# eval STFT hop (n_fft=255 -> hop 63, config.EVAL_HOP): the spacing of
# the hallucination lattice (see STABILITY_LOCK note)
_EVAL_HOP = 63


def lattice_offset_search(wave: np.ndarray,
                          roll_fns: Tuple[Callable, Callable],
                          max_shift: int = 1024, block: int = 16,
                          hop: int = _EVAL_HOP, n_finalists: int = 24,
                          ) -> Tuple[int, np.ndarray, float, float]:
    """Offset search with device-roll block scoring + hop-stability
    verification; returns (offset, decodes, confidence, stability).

    Stage 1 crawls the whole +-max_shift window with
    ``score_rolls(offsets) -> (confidence, saturation)`` — device-side
    rolls make a block cost bytes through the remote-TPU tunnel (the
    serial search measured ~1.6 s/offset; a block of 16 scores in
    ~0.5 s). No early exit: hop-lattice hallucinations can out-score the
    true offset (see STABILITY_LOCK), so the confidence crawl only
    NOMINATES finalists. Stage 2 decodes each finalist at {o, o+hop,
    o-hop} and picks the finalist whose decode is most invariant to the
    +-1 hop roll — the measured signature of true alignment."""
    score_rolls, decode_rolls = roll_fns
    prof = _PROFILE

    def score_many(offs, confs):
        for i in range(0, len(offs), block):
            blk = offs[i:i + block]
            padded = blk + [0] * (block - len(blk))
            conf, _ = score_rolls(np.asarray(padded, np.int32))
            for off, c in zip(blk, conf):
                confs[off] = float(c)

    def pick_basins(confs):
        c_min = min(confs.values())
        basins: List[int] = []
        for off in sorted(confs, key=confs.get):
            if all(abs(off - f) >= prof.basin_radius for f in basins):
                basins.append(off)
            if len(basins) >= 48 or (len(basins) >= n_finalists
                                     and confs[off] > c_min + 0.04):
                break
        return basins

    # Coarse crawl at the profile stride: the lock basin degrades
    # gracefully (ri: +-1 sample, 0.089 -> ~0.10 vs >=0.16 garbage; mag:
    # a smooth radius>=16 bowl), so the coarse grid cannot step over it;
    # each coarse basin is then descended to its stride-1 argmin via the
    # profile's descent net before finalist selection (the mag bowl is
    # wide — a +-2 refine left finalists mid-bowl, and only the bowl's
    # argmin carries the true offset; measured: dedup radius 8 > refine
    # radius 2 made the search miss a true shift of 828 entirely).
    confs: dict = {}
    score_many(list(range(-max_shift, max_shift + 1, prof.coarse_stride))
               + [0], confs)
    refine = [b + d for b in pick_basins(confs)
              for d in prof.descent if abs(b + d) <= max_shift]
    score_many([o for o in set(refine) if o not in confs], confs)
    if prof.stability_rules:
        # close the descent: the net above has stride-1 coverage only
        # near the basin rep; polish each surviving basin's current
        # argmin with +-1..2 so the finalist IS the bowl's argmin
        polish = [b + d for b in pick_basins(confs)
                  for d in (-2, -1, 1, 2) if abs(b + d) <= max_shift]
        score_many([o for o in set(polish) if o not in confs], confs)
    # Finalists: every distinct near-minimum basin. The hallucination
    # lattice is DENSE (a +-1024 window holds ~32 hop-lattice points,
    # many of which out-score the true offset — measured: 12+ impostor
    # basins below the true offset's 0.0889), so a small top-K by
    # confidence can exclude the true offset entirely; the stability
    # probe is cheap (3 decodes per finalist), so take every basin
    # within 0.02 of the global confidence minimum, floor n_finalists,
    # cap 48.
    finalists = pick_basins(confs)
    probe = [x for o in finalists for x in (o, o + hop, o - hop)]
    decs = []
    for i in range(0, len(probe), block):
        blk = probe[i:i + block]
        padded = blk + [0] * (block - len(blk))
        decs.extend(decode_rolls(np.asarray(padded, np.int32))[:len(blk)])
    best = None
    ranked = []
    for j, off in enumerate(finalists):
        d0, dp, dm = decs[3 * j], decs[3 * j + 1], decs[3 * j + 2]
        stab = 0.5 * (float(np.mean((d0 - dp) ** 2))
                      + float(np.mean((d0 - dm) ** 2)))
        ranked.append((stab, confs[off], off))
        key = (stab, confs[off])
        if best is None or key < best[0]:
            best = (key, off, d0)
    _dbg("lattice finalists (stab, conf, off): "
         + str([(round(s, 5), round(c, 4), o)
                for s, c, o in sorted(ranked)[:6]]))
    _, off, d0 = best
    # finalists[0] is the raw confidence argmin; when the stability pick
    # and the confidence pick agree, the evidence is consistent even if
    # the extractor has no hop tolerance (stab then measures glyph-vs-
    # garbage distance, not alignment) — callers use this for acceptance
    conf_agrees = off == finalists[0]
    return off, d0, confidence(d0), best[0][0], conf_agrees


def piecewise_offset_search(wave: np.ndarray, extract_fn,
                            offsets=range(-48, 49, 2),
                            roll_fns: Optional[Tuple[Callable,
                                                     Callable]] = None,
                            block: int = 16,
                            ) -> Tuple[np.ndarray, float]:
    """Per-clip offset repair for PROGRESSIVE drift (deletion attacks):
    after the global length restore, the residual misalignment is a slow
    random walk — approximately constant within each 128-frame clip but
    different between clips. Extract at every offset in ``offsets`` and
    compose the result by taking, for each clip, the decode with the
    best per-clip saturation. Returns (decodes, confidence of the
    composition). Purely blind, like the global search.

    With ``roll_fns``, saturations come from device-side roll scoring
    (cheap), and only the per-clip WINNING offsets are decoded in full
    (one decode_rolls block)."""
    offsets = [int(o) for o in offsets]
    if roll_fns is not None:
        score_rolls, decode_rolls = roll_fns
        sat_rows = []
        for i in range(0, len(offsets), block):
            blk = offsets[i:i + block]
            padded = blk + [0] * (block - len(blk))
            _, sat = score_rolls(np.asarray(padded, np.int32))
            sat_rows.extend(sat[:len(blk)])
        sat = np.stack(sat_rows)             # (n_offsets, n_clips)
        pick = np.argmin(sat, axis=0)        # per-clip winning offset idx
        uniq = sorted({offsets[p] for p in pick})
        dec_u = []
        for i in range(0, len(uniq), block):
            blk = uniq[i:i + block]
            padded = blk + [0] * (block - len(blk))
            dec_u.extend(decode_rolls(np.asarray(padded,
                                                 np.int32))[:len(blk)])
        by_off = dict(zip(uniq, dec_u))
        out = np.stack([by_off[offsets[p]][c]
                        for c, p in enumerate(pick)])
        return out, confidence(out)
    sats, decs = [], []
    for off in offsets:
        d = np.asarray(extract_fn(np.roll(wave, -off)))
        decs.append(d)
        sats.append(_per_clip_score(d))
    sat = np.stack(sats)                     # (n_offsets, n_clips)
    dec = np.stack(decs)                     # (n_offsets, n_clips, ...)
    pick = np.argmin(sat, axis=0)
    out = dec[pick, np.arange(dec.shape[1])]
    return out, confidence(out)


def gated_piecewise_repair(decodes: np.ndarray,
                           roll_fns: Tuple[Callable, Callable],
                           offsets=range(-48, 49, 2),
                           block: int = 16,
                           hop: int = _EVAL_HOP,
                           ) -> Tuple[np.ndarray, bool]:
    """Per-clip drift repair for a GLOBALLY locked decode (see the
    CLIP_UNLOCKED note): clips whose per-clip saturation exceeds
    CLIP_UNLOCKED are re-searched over ``offsets`` (coarse stride-2 grid,
    then each broken clip's winner refined at stride 1 — the lock basin
    is sample-exact, so an odd-sample drift lands one off the even grid
    and would otherwise be rejected by the CLIP_ACCEPT gate). A
    replacement is accepted only when its saturation is an unambiguous
    per-clip lock (< CLIP_ACCEPT), beats the current clip by CLIP_MARGIN,
    AND its decode is invariant to a further +-1 hop roll
    (CLIP_STABILITY — hop-lattice impostors decode stable wrong glyphs
    under the saturation gate). Locked clips pass through untouched.
    Returns (decodes, changed)."""
    dec = np.asarray(decodes)
    sat0 = _per_clip_score(dec)
    broken = np.nonzero(sat0 > CLIP_UNLOCKED)[0]
    if broken.size == 0:
        return dec, False
    score_rolls, decode_rolls = roll_fns
    offsets = [int(o) for o in offsets]

    def score_many(offs):
        rows = []
        for i in range(0, len(offs), block):
            blk = offs[i:i + block]
            padded = blk + [0] * (block - len(blk))
            _, sat = score_rolls(np.asarray(padded, np.int32))
            rows.extend(sat[:len(blk)])
        return rows

    sat_rows = score_many(offsets)
    # coarse winners -> stride-1 refinement around each broken clip's
    # winner (coarse->refine, mirroring lattice_offset_search)
    sat = np.stack(sat_rows)                 # (n_offsets, n_clips)
    coarse = {int(offsets[int(np.argmin(sat[:, c]))]) for c in broken}
    refine = sorted({w + d for w in coarse for d in (-1, 1)}
                    - set(offsets))
    if refine:
        sat_rows.extend(score_many(refine))
        offsets = offsets + refine
        sat = np.stack(sat_rows)
    # winning offset per broken clip, saturation-gated
    pick = {}
    for c in broken:
        j = int(np.argmin(sat[:, c]))
        if sat[j, c] < CLIP_ACCEPT and sat[j, c] < sat0[c] - CLIP_MARGIN:
            pick[int(c)] = offsets[j]
    if not pick:
        return dec, False
    # Decode a 5-point hop lattice {o-2h, o-h, o, o+h, o+2h} around each
    # winning offset: the winner's saturation cannot distinguish the true
    # lock from its own +-1-hop lattice neighbour (the true offset's
    # decode IS hop-stable, so the neighbour is equally saturated), so
    # each of {o, o+-hop} is a candidate and the per-clip hop-stability
    # gate (CLIP_STABILITY) arbitrates; among stable candidates the most
    # saturated-locked one wins. Hop-lattice impostors fail the gate on
    # both sides (measured >= 0.0060 per clip).
    uniq = sorted(set(pick.values()))
    lattice = (-2 * hop, -hop, 0, hop, 2 * hop)
    probe = [o + d for o in uniq for d in lattice]
    dec_u = []
    for i in range(0, len(probe), block):
        blk = probe[i:i + block]
        padded = blk + [0] * (block - len(blk))
        dec_u.extend(decode_rolls(np.asarray(padded, np.int32))[:len(blk)])
    by_off = {o: dec_u[5 * j:5 * j + 5] for j, o in enumerate(uniq)}
    out = dec.copy()
    changed = False
    for c, off in pick.items():
        row = by_off[off]
        best = None
        for k in (2, 1, 3):                   # candidates o, o-hop, o+hop
            d0, dm, dp = row[k][c], row[k - 1][c], row[k + 1][c]
            stab = 0.5 * (float(np.mean((d0 - dp) ** 2))
                          + float(np.mean((d0 - dm) ** 2)))
            sat_c = float(_per_clip_score(d0[None])[0])
            if stab > CLIP_STABILITY or sat_c >= CLIP_ACCEPT \
                    or sat_c >= sat0[c] - CLIP_MARGIN:
                continue
            if best is None or sat_c < best[0]:
                best = (sat_c, d0)
        if best is not None:
            out[c] = best[1]
            changed = True
    return out, changed


def best_candidate(att_audio: np.ndarray, expected_len: int,
                   extract_fn: Callable[[np.ndarray], np.ndarray],
                   pitch_steps: Tuple[float, ...] = (6.0, -6.0),
                   max_shift: int = 1024,
                   make_roll_fns: Optional[Callable] = None,
                   ) -> Tuple[np.ndarray, np.ndarray, str, float]:
    """Run ``extract_fn`` (wave -> per-clip decodes) over the candidate
    set and return (best_wave, best_decodes, candidate_name, score).

    Stages, cheapest-first (each returns as soon as something locks
    below LOCK_THRESHOLD): (1) cheap candidates — identity / deletion
    repair / length-restoring resample-unstretch; (2) roll search on the
    best roll-repairable candidate; (3) pitch-inverse hypotheses (a host
    phase vocoder, ~1 min/utterance — synthesized only if nothing
    locked); (4) per-clip piecewise drift repair. The roll search runs
    the full +-max_shift window when the received length matched (a pure
    time_shift), a +-64 refinement window otherwise (residual offset
    after the length-restoring resample/unstretch)."""
    prof = _PROFILE
    best = None
    anchor = None        # best ROLL-REPAIRABLE candidate (see below)
    anchor_verified = False
    saw_deletion_tail = False
    unstretch = None     # the physically-implied candidate (see below)
    _stab_cache: dict = {}

    def locked(cand) -> bool:
        """Is this (wave, dec, name, score) candidate a real lock?

        ri profile: confidence alone decides (bands separate). mag
        profile: the garbage floor (0.0904) sits below the bowl's own
        neighbours, so a conf-only verdict can bless garbage — a lock
        must ALSO be hop-stable (true 0.0039-0.0040 vs garbage
        >= 0.0295, measured r4_sync_calibration). Costs one 3-offset
        decode block per distinct wave; falls back to conf-only when
        no device roll fns exist (serial/test path)."""
        if cand[3] >= LOCK_THRESHOLD:
            return False
        if not prof.stability_rules or make_roll_fns is None:
            return True
        key = id(cand[1])
        if key not in _stab_cache:
            _, decode_rolls = make_roll_fns(cand[0])
            d = decode_rolls(np.asarray([0, _EVAL_HOP, -_EVAL_HOP, 0],
                                        np.int32))
            stab = 0.5 * (float(np.mean((d[0] - d[1]) ** 2))
                          + float(np.mean((d[0] - d[2]) ** 2)))
            _dbg(f"lock probe: {cand[2]}@{cand[3]:.4f} stab={stab:.5f}")
            _stab_cache[key] = stab <= STABILITY_LOCK
        return _stab_cache[key]
    for name, wave in resync_candidates(att_audio, expected_len,
                                        pitch_steps=pitch_steps,
                                        stage="base"):
        saw_deletion_tail |= name.startswith("detail[")
        dec = extract_fn(wave)
        score = confidence(dec)
        if name.startswith("unstretch["):
            unstretch = (wave, dec, name, score)
        if best is None or score < best[3]:
            best = (wave, dec, name, score)
        # Pitch candidates are a TERMINAL hypothesis: either the inverse
        # pitch shift locks outright or the hypothesis is wrong — a roll
        # or piecewise repair of a pitch-shifted wave can never lock.
        # Anchoring the fallback searches on "whichever unlocked
        # candidate scored lowest" let a pitch wave win the coin flip
        # among garbage scores (~0.165 vs ~0.17) and sent the roll
        # search down a dead end (measured: time_shift-300 stayed at
        # WM-MSE 0.073 because offset_search crawled pitch[-6]); the
        # base stage is pitch-free, so every candidate here qualifies.
        if anchor is None or score < anchor[3]:
            anchor = (wave, dec, name, score)
    if not locked(best) and anchor is not None:
        length_matched = np.asarray(att_audio).reshape(-1).shape[-1] \
            == expected_len
        # full-window roll only for a suspected pure constant shift
        # (length intact, no deletion tail); a big roll cannot repair
        # progressive drift or pitch, so elsewhere just refine +-64
        window = max_shift if (length_matched
                               and not saw_deletion_tail) else 64
        stab = None          # set only on the lattice (device-roll) path
        if make_roll_fns is not None:
            off, dec, c, stab, conf_agrees = lattice_offset_search(
                anchor[0], make_roll_fns(anchor[0]), max_shift=window)
            _dbg(f"roll stage: anchor={anchor[2]}@{anchor[3]:.4f} -> "
                 f"off={off} conf={c:.4f} stab={stab:.5f} "
                 f"agrees={conf_agrees}")
            # hop-stability gate (see STABILITY_LOCK): without it,
            # lattice hallucinations pass the confidence margins;
            # conf_agrees covers extractors without hop tolerance. For
            # the mag profile a roll is accepted on COMPOSITE evidence —
            # hop-stability AND a confidence inside the roll-accept
            # band. Neither signal suffices alone: conf_agrees is
            # unreliable (the conf argmin can be a garbage dip below the
            # bowl's neighbours) and the conf margin can reject a true
            # repair (true 0.0892 vs a garbage anchor at 0.0904 is
            # inside any sane margin); hop-stability alone is defeated
            # by warped (pitch/vocoder) inputs, which decode hop-STABLE
            # garbage at many offsets (measured pw2,
            # scripts/r4_sync_probe.py: pitch-row roll finalists at stab
            # 0.0037-0.0048, all under the 0.006 gate, true MSE 0.113 vs
            # identity's 0.081). Every measured TRUE repair's conf sits
            # inside the roll-accept band (time_shift 0.0903, jittering
            # 0.1179) and the warped-garbage rolls sit outside it
            # (0.1298-0.1336); stability contrast cannot substitute —
            # the pw2 bowl is wide and flat (true-shift finalists
            # 743-905 all at 0.00045-0.00056).
            if prof.stability_rules:
                accepted = stab <= STABILITY_LOCK and c < prof.roll_accept
            else:
                accepted = (stab <= STABILITY_LOCK or conf_agrees) and (
                    c < ACCEPT_THRESHOLD or c < anchor[3] - REPAIR_MARGIN)
            # the extra conf clause below is a mag-profile rule: on the
            # ri profile an aligned-but-noisy decode (awgn measured
            # ~0.122) sits above lock=0.12 and must still take the
            # verified-alignment shortcut — losing it triggers the
            # ~1 min/utterance host phase-vocoder pitch stage the
            # shortcut exists to skip (ADVICE r4, medium).
            if off == 0 and stab <= STABILITY_LOCK and (
                    not prof.stability_rules or c < LOCK_THRESHOLD):
                # the stability winner is the UNROLLED anchor itself:
                # the anchor is verified GLOBALLY aligned (aligned-but-
                # noisy decodes, e.g. awgn, land here) — the pitch warp
                # hypotheses cannot beat a verified alignment, skip
                # them. Piecewise still runs: a deletion-repaired wave
                # is globally aligned yet carries per-clip residual
                # drift (jitter rows measured 0.064 when the shortcut
                # skipped piecewise vs 0.018 with it).
                anchor_verified = True
        else:
            off, dec, c = offset_search(anchor[0], extract_fn,
                                        max_shift=window)
            # margin acceptance: a roll that merely edges out the
            # unrolled anchor (e.g. 0.112 vs 0.122 on an aligned-but-
            # noisy awgn decode) is saturation hacking, not a repair; an
            # unambiguous lock (< ACCEPT_THRESHOLD) is always believed
            accepted = (c < ACCEPT_THRESHOLD
                        or c < anchor[3] - REPAIR_MARGIN)
        if accepted:
            rolled = np.roll(anchor[0], -off)
            anchor = (rolled, dec, f"{anchor[2]}+roll[{-off:+d}]", c)
            # the repair's winner already passed (or failed) the
            # hop-stability probe — seed the lock cache so the stage
            # gates below don't re-probe the same decode
            if stab is not None:
                _stab_cache[id(dec)] = stab <= STABILITY_LOCK
        # a stability-verified repair outranks ANY conf-only best: under
        # the mag profile a garbage conf dip (measured 0.0904, below the
        # bowl's own +-1 neighbours) can out-score the true offset's
        # 0.0892, and no garbage decode is hop-stable
        if anchor[3] < best[3] or (prof.stability_rules and accepted
                                   and stab is not None
                                   and stab <= STABILITY_LOCK):
            best = anchor
    if not locked(best) and not anchor_verified:
        # nothing locked and the alignment is not verified: synthesize
        # the pitch-inverse hypotheses (expensive host phase vocoder,
        # hence deferred to this stage)
        sibs = []
        for name, wave in resync_candidates(att_audio, expected_len,
                                            pitch_steps=pitch_steps,
                                            stage="pitch"):
            dec = extract_fn(wave)
            sibs.append((wave, dec, name, confidence(dec)))
        if sibs:
            pick = min(sibs, key=lambda s: s[3])
            near = [s for s in sibs if s[3] <= pick[3] + REPAIR_MARGIN]
            if (prof.stability_rules and make_roll_fns is not None
                    and len(near) > 1):
                # Sibling degeneracy tie-break (measured on pw2,
                # scripts/r4_pitch_probe.py, both utterances): the two
                # pitch hypotheses' confidences are coin flips inside
                # the garbage band (gap 0.002-0.005), but the WRONG
                # sibling — the one that doubles the warp instead of
                # undoing it — produces an under-excited, near-constant
                # decode whose hop-stability is degenerately LOW
                # (0.0027-0.0031 vs the true inverse's 0.0044-0.0080;
                # true-inverse MSE 0.042 vs wrong 0.074-0.089). Among
                # siblings within REPAIR_MARGIN of the conf argmin,
                # prefer the most hop-RESPONSIVE decode — but cap the
                # responsiveness at the garbage band (calibration:
                # fully-garbage decodes are maximally unstable,
                # stab >= 0.0295): "responsive" must not be able to mean
                # "garbage" if more than two hypotheses are ever in play
                # (ADVICE r4, low).
                def hop_responsiveness(s):
                    _, decode_rolls = make_roll_fns(s[0])
                    d = decode_rolls(np.asarray(
                        [0, _EVAL_HOP, -_EVAL_HOP, 0], np.int32))
                    return 0.5 * (float(np.mean((d[0] - d[1]) ** 2))
                                  + float(np.mean((d[0] - d[2]) ** 2)))
                scored = [(s, hop_responsiveness(s)) for s in near]
                live = [sr for sr in scored
                        if sr[1] < STABILITY_LOCK * 4]
                if live:
                    pick = max(live, key=lambda sr: sr[1])[0]
                _dbg(f"pitch stage: degeneracy tie-break over "
                     f"{[(s[2], round(s[3], 4)) for s in near]} "
                     f"-> {pick[2]}")
            if pick[3] < best[3]:
                _dbg(f"pitch stage: {best[2]}@{best[3]:.4f} -> "
                     f"{pick[2]}@{pick[3]:.4f}")
                best = pick
    if not locked(best) and anchor is not None:
        # still no global lock: progressive-drift repair, clip by clip
        roll_fns = make_roll_fns(anchor[0]) if make_roll_fns else None
        dec, c = piecewise_offset_search(anchor[0], extract_fn,
                                         roll_fns=roll_fns)
        if c < ACCEPT_THRESHOLD or c < best[3] - REPAIR_MARGIN:
            best = (anchor[0], dec, f"{anchor[2]}+piecewise", c)
    if not locked(best) and unstretch is not None \
            and best[3] > unstretch[3] - REPAIR_MARGIN:
        # Physical prior (round-4b): a received length off by more than
        # vocoder_threshold means the time base was REALLY stretched —
        # the battery's only such attack is the phase vocoder — so the
        # inverse-stretch hypothesis is evidence in itself. When no
        # candidate locked, the remaining confidence differences are
        # coin flips inside the garbage band (measured on the vocoder
        # rows: pitch[-6] 0.1722 vs unstretch 0.1811 picked the WORSE
        # decode, 0.0775 vs 0.0616 true MSE — scripts/r4_sync_probe.py),
        # and a wrong terminal hypothesis must not out-rank the
        # physically-implied one unless it beats it by a real margin.
        _dbg(f"prior: {best[2]}@{best[3]:.4f} -> {unstretch[2]}"
             f"@{unstretch[3]:.4f}")
        best = unstretch
    if locked(best) and make_roll_fns is not None:
        # globally locked, but a drifted minority of clips may remain
        # (none of the repair stages above ran) — per-clip gated repair.
        # Accepted only if the composed confidence does not regress (a
        # repair that lowers every repaired clip's saturation but raises
        # cross-clip variance replaced glyphs with consistent garbage).
        dec, changed = gated_piecewise_repair(best[1],
                                              make_roll_fns(best[0]))
        if changed:
            c_new = confidence(dec)
            _dbg(f"clipfix: {best[3]:.4f} -> {c_new:.4f}")
            if c_new <= best[3]:
                best = (best[0], dec, f"{best[2]}+clipfix", c_new)
    _dbg(f"final: {best[2]} score={best[3]:.4f}")
    return best
