"""Attack x split evaluation sweep.

Parity target: ``evaluate.test`` / ``model_test``
(uformerWM/evaluate.py:174-380) — per attack and data split, aggregate
Total Clips / MSE / WM loss / WM loss after attack / SNR / PESQ, append a
``sample_result.txt`` line with the reference's exact format (so
result_extract.py's regex works unchanged), and emit ``results.csv``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np

from image_in_speech_watermarking_tpu.eval.pipeline import reconstruct_audio
from image_in_speech_watermarking_tpu.eval.result_extract import (
    process_data_to_csv)

RESULT_LINE = ("Result on {set} set, attack: {attack}: Total clips: "
               "{clips}, MSE loss {mse}, WM loss: {wm}, WM loss after "
               "attack: {wm_att}, SNR score: {snr}, PESQ score: {pesq}, "
               "BER: {ber}, BER after attack: {ber_att}, WM att std: "
               "{wm_att_std}, Utterances: {utts}{codec_suffix}\n")

# the reference's full sweep (evaluate.py:357-368) incl. the time/pitch
# scaling variants (VERDICT r1 weak #6)
DEFAULT_ATTACKS = (
    "closed_loop", "amplitude_scaling-0.8", "echo_addition", "low_pass",
    "awgn-15", "resampling", "requantization", "jittering-1000",
    "jittering_2-1000", "aac", "mp3compress-64k",
    "time_scaling-0.9", "time_scaling-1.1", "pitch_scaling",
)


def evaluate_split(model, variables, dataset, messages,
                   attack: str = "closed_loop", data_cat: str = "train",
                   model_name: str = "uformer",
                   result_path: Optional[str] = None,
                   use_host_codecs: bool = False, seed: int = 0,
                   audio_scale: str = "0", data_min: float = 0.0,
                   data_max: float = 1.0,
                   save_artifacts: int = 0,
                   resync: bool = False) -> dict:
    """Evaluate one attack over every utterance of a split
    (evaluate.py:174-293). ``save_artifacts``: dump the reference's
    per-utterance wav/png/watermark artifact set (evaluate.py:239-282)
    for the first N utterances into ``<result_path>/artifacts``."""
    mses, wms, wms_att, snrs, pesqs, clips_n = [], [], [], [], [], []
    bers, bers_att = [], []
    for i in range(len(dataset)):
        wave, clips, tail = dataset.utterance(i)
        msg = messages[i % len(messages)][None]
        r = reconstruct_audio(
            wave, clips, tail, msg, model, variables, attack=attack,
            model_name=model_name,
            attack_key=jax.random.key(seed + i),
            use_host_codecs=use_host_codecs, audio_scale=audio_scale,
            data_min=data_min, data_max=data_max, resync=resync)
        if result_path and i < save_artifacts:
            from image_in_speech_watermarking_tpu.eval import artifacts

            artifacts.save_eval_artifacts(
                os.path.join(result_path, "artifacts"),
                f"{data_cat}_{attack}_utt{i}", wave, r, msg)
        mses.append(r.audio_mse)
        wms.append(r.wm_mse)
        wms_att.append(r.wm_mse_att)
        snrs.append(r.snr)
        if r.pesq is not None:
            pesqs.append(r.pesq)
        clips_n.append(r.n_clips)
        bers.append(r.ber)
        bers_att.append(r.ber_att)

    agg = {
        "set": data_cat, "attack": attack,
        "clips": int(np.sum(clips_n)),
        "mse": float(np.mean(mses)),
        "wm": float(np.mean(wms)),
        "wm_att": float(np.mean(wms_att)),
        "snr": float(np.mean(snrs)),
        "pesq": float(np.mean(pesqs)) if pesqs else float("nan"),
        # round-4 schema extension (VERDICT r3 #4): thresholded payload
        # BER next to the MSEs, per-utterance spread, and the utterance
        # count the row aggregates
        "ber": round(float(np.mean(bers)), 6),
        "ber_att": round(float(np.mean(bers_att)), 6),
        "wm_att_std": round(float(np.std(wms_att)), 6),
        "utts": len(dataset),
    }
    # Round-5 evidence hygiene (VERDICT r4 weak #8): codec rows must say
    # which path produced them — real ffmpeg transcode or the calibrated
    # simulator (docs/CODEC_CALIBRATION.md). Non-codec rows get no suffix
    # (reference line format untouched).
    if attack.split("-")[0] in ("aac", "mp3compress"):
        from image_in_speech_watermarking_tpu.attacks import host as _host

        real = use_host_codecs and _host.have_ffmpeg()
        agg["codec_suffix"] = (
            ", Codec path: " + ("ffmpeg" if real else "sim"))
    else:
        agg["codec_suffix"] = ""
    if result_path:
        os.makedirs(result_path, exist_ok=True)
        with open(os.path.join(result_path, "sample_result.txt"), "a") as f:
            f.write(RESULT_LINE.format(**agg))
    return agg


def evaluate_model(model, variables, datasets: dict, messages,
                   attacks: Sequence[str] = DEFAULT_ATTACKS,
                   model_name: str = "uformer",
                   result_path: Optional[str] = None,
                   use_host_codecs: bool = False,
                   audio_scale: str = "0", data_min: float = 0.0,
                   data_max: float = 1.0,
                   save_artifacts: int = 0,
                   resync: bool = False) -> list[dict]:
    """attack x {train, test} sweep (evaluate.py:369-380) + results.csv."""
    results = []
    for attack in attacks:
        for data_cat, ds in datasets.items():
            results.append(evaluate_split(
                model, variables, ds, messages, attack=attack,
                data_cat=data_cat, model_name=model_name,
                result_path=result_path, use_host_codecs=use_host_codecs,
                audio_scale=audio_scale, data_min=data_min,
                data_max=data_max, save_artifacts=save_artifacts,
                resync=resync))
        # Each attack row jits fresh programs (exact-length host attacks,
        # per-bucket extract/sync signatures) and JAX's executable cache
        # never evicts: a 17-attack N=5 resync sweep grew to 130 GB RSS
        # and was OOM-killed on its last row. Dropping the caches between
        # rows bounds host memory at one row's working set; the next row
        # re-traces what it needs.
        jax.clear_caches()
    if result_path:
        with open(os.path.join(result_path, "sample_result.txt")) as f:
            process_data_to_csv(f.read(),
                                os.path.join(result_path, "results.csv"))
    return results
