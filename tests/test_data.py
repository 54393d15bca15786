"""Data layer: vocab, audio IO, TextGrid, collators, bucketed loader,
synthetic corpora through the real dataset classes, LOSO split contract."""

import ast

import numpy as np
import pandas as pd
import pytest

from aptai_tpu import CTC_LABEL_PAD_ID, TV_PAD_VALUE
from aptai_tpu.data import (
    BucketedLoader,
    CommonPhoneDataset,
    HPRCDataset,
    build_vocab,
    collate_ctc,
    collate_tv,
    ids_to_phonemes,
    load_vocab,
    make_synthetic_commonphone,
    make_synthetic_hprc,
    phonemes_to_ids,
    save_vocab,
    speaker_onehot,
)
from aptai_tpu.data.audio_io import load_wav_16k, resample_np, save_wav
from aptai_tpu.data.hprc import loso_split
from aptai_tpu.data.hprc_prep import (
    match_phonemes_to_frames,
    phoneme_frame_labels,
    zscore_utterance,
)
from aptai_tpu.data.textgrid import Interval, parse_textgrid, write_textgrid


def test_vocab_contract(tmp_path):
    vocab = build_vocab(["b a (...)", "c a"])
    assert vocab["(blank)"] == 0
    assert list(vocab.keys())[0] == "(blank)"
    assert sorted(vocab.values()) == list(range(len(vocab)))
    # sorted set after blank
    toks = list(vocab)[1:]
    assert toks == sorted(toks)
    save_vocab(vocab, tmp_path / "vocab.json")
    assert load_vocab(tmp_path / "vocab.json") == vocab
    ids = phonemes_to_ids(vocab, "a b c")
    assert ids_to_phonemes(vocab, ids) == ["a", "b", "c"]


def test_wav_roundtrip_and_resample(tmp_path):
    rng = np.random.default_rng(0)
    audio = (0.5 * np.sin(2 * np.pi * 440 * np.arange(44100) / 44100)).astype(
        np.float32
    )
    save_wav(tmp_path / "a.wav", audio, 44100)
    out = load_wav_16k(tmp_path / "a.wav")
    assert len(out) == int(np.ceil(16000 * len(audio) / 44100))
    # numpy resampler == jax resampler
    import jax.numpy as jnp
    from aptai_tpu.ops import resample

    got_np = resample_np(audio, 44100, 16000)
    got_jax = np.asarray(resample(jnp.asarray(audio), 44100, 16000))
    np.testing.assert_allclose(got_np, got_jax, rtol=1e-4, atol=1e-5)


def test_textgrid_roundtrip(tmp_path):
    tiers = {
        "MAU": [Interval(0.0, 0.5, "(...)"), Interval(0.5, 0.9, "a")],
        "ORT-MAU": [Interval(0.0, 0.9, "hello")],
    }
    write_textgrid(tmp_path / "t.TextGrid", tiers)
    parsed = parse_textgrid(tmp_path / "t.TextGrid")
    assert [iv.text for iv in parsed["MAU"]] == ["(...)", "a"]
    assert parsed["MAU"][1].xmin == pytest.approx(0.5)
    assert parsed["ORT-MAU"][0].text == "hello"


def test_match_phonemes_to_frames_reference_semantics():
    # boundaries: starts [0, .2, .5] + end .8; 20 ms frames
    frames = match_phonemes_to_frames([0.0, 0.2, 0.5, 0.8], ["a", "b", "c"])
    # frame 0 gets 'a'; carries until boundary .2 -> 'b' at frame 10, etc.
    assert frames[0] == "a"
    assert frames[9] == "a"
    assert frames[10] == "b"
    assert frames[24] == "b"
    assert frames[25] == "c"
    assert len(frames) == int(0.8 * 100) // 2 + 1


def test_commonphone_synthetic_end_to_end(tmp_path):
    csv_path = make_synthetic_commonphone(tmp_path, 4, 1, 1)
    df = pd.read_csv(csv_path)
    assert len(df) == 6
    vocab = build_vocab(df.phonemes)
    ds = CommonPhoneDataset(df[df.split == "train"], vocab)
    item = ds[0]
    assert item["audio"].dtype == np.float32
    assert item["audio_len"] == len(item["audio"])
    assert all(0 < i < len(vocab) for i in item["phoneme_label"])

    # cropping keeps a contiguous label span
    ds_crop = CommonPhoneDataset(df[df.split == "train"], vocab, cropping=True)
    item_c = ds_crop[0]
    assert item_c["audio_len"] == 16000
    full = list(item["phoneme_label"])
    sub = list(item_c["phoneme_label"])
    assert len(sub) <= len(full)
    # contiguity: sub appears as a slice of full
    found = any(full[i : i + len(sub)] == sub
                for i in range(len(full) - len(sub) + 1))
    assert found


def test_collate_ctc_sentinels():
    items = [
        {"audio": np.ones(100, np.float32), "audio_len": 100,
         "phoneme_label": np.array([1, 2], np.int32)},
        {"audio": np.ones(200, np.float32), "audio_len": 200,
         "phoneme_label": np.array([3], np.int32)},
    ]
    b = collate_ctc(items, bucket=False)
    assert b["audio"].shape == (2, 200)
    assert b["audio"][0, 150] == 0.0
    assert b["phoneme_labels"][1, 0] == 3
    assert b["phoneme_labels"][1, 1] == CTC_LABEL_PAD_ID
    bb = collate_ctc(items, bucket=True)
    assert bb["audio"].shape[1] % 16000 == 0


def test_hprc_synthetic_end_to_end(tmp_path):
    csv_path = make_synthetic_hprc(tmp_path, utts_per_speaker=2)
    df = pd.read_csv(csv_path)
    assert set(df.rate) == {"N", "F"}
    vocab = build_vocab(df.phoneme_labels)
    ds = HPRCDataset(df, vocab, rate="both")
    item = ds[0]
    # TV arrays at the encoder frame rate match the frame-label length
    assert item["tvs_norm_49hz_array"].shape == (
        len(item["phn_frames_49hz"]), 9
    )
    assert item["spk_emb"].sum() == 1.0
    # frame labels never use the blank/pad id 0
    assert (np.asarray(item["phn_frames_49hz"]) > 0).all()

    ds_n = HPRCDataset(df, vocab, rate="N")
    assert len(ds_n) == len(df) // 2

    batch = collate_tv([ds[i] for i in range(3)])
    assert batch["tv_targets"].shape[-1] == 9
    # padding region sentinel: frame-label pad 0 ⟺ TV pad −100.0
    assert (batch["tv_targets"][0][batch["phn_frames"][0] == 0] ==
            TV_PAD_VALUE).all()
    t = batch["phn_frames"].shape[1]
    assert batch["tv_targets"].shape[1] == t


def test_bucketed_loader_covers_dataset(tmp_path):
    csv_path = make_synthetic_commonphone(tmp_path, 7, 1, 1)
    df = pd.read_csv(csv_path)
    vocab = build_vocab(df.phonemes)
    ds = CommonPhoneDataset(df[df.split == "train"], vocab)
    loader = BucketedLoader(ds, batch_size=4, collate_fn=collate_ctc)
    seen = 0
    for batch in loader:
        assert batch["audio"].shape[0] == 4
        assert batch["audio"].shape[1] % 16000 == 0
        seen += int(batch["batch_pad_mask"].sum())
    assert seen == len(ds)


def test_loso_split_contract(tmp_path):
    csv_path = make_synthetic_hprc(tmp_path, utts_per_speaker=3)
    df = pd.read_csv(csv_path)
    train, valid, test_n, test_f = loso_split(df, "M01", "both")
    assert set(test_n.speaker) == {"M01"} and set(test_f.speaker) == {"M01"}
    assert (test_n.rate == "N").all() and (test_f.rate == "F").all()
    assert "M01" not in set(train.speaker) | set(valid.speaker)
    # text-disjoint validation
    assert not set(train.text) & set(valid.text)
    # rate filter variant
    train_n, valid_n, _, _ = loso_split(df, "M01", "N")
    assert (train_n.rate == "N").all()
    # small corpora still get a non-empty validation set (int(0.1·n) would
    # floor to zero texts → NaN val metrics and a dead best-ckpt watermark)
    assert len(valid) > 0 and len(valid_n) > 0


def test_loso_split_floor_respects_rate_and_zero_fraction(tmp_path):
    csv_path = make_synthetic_hprc(tmp_path, utts_per_speaker=3)
    df = pd.read_csv(csv_path)
    # an explicit valid_text_fraction=0 means NO validation set (no floor)
    train0, valid0, _, _ = loso_split(df, "M01", "both",
                                      valid_text_fraction=0.0)
    assert len(valid0) == 0
    # the k=1 floor must pick a text that has rows at the requested rate:
    # make one text F-only, then ask for rate N — the forced validation
    # text must still yield a non-empty N-rate validation set
    f_only_text = df.text.unique()[0]
    df2 = df[~((df.text == f_only_text) & (df.rate == "N"))]
    for seed in range(5):
        _, valid_n, _, _ = loso_split(df2, "M01", "N", seed=seed)
        assert len(valid_n) > 0
        assert (valid_n.rate == "N").all()


def test_plot_f0_wav_saves_figure(tmp_path):
    from aptai_tpu.utils.plotting import plot_f0_wav

    fs = 16000
    wav = np.sin(2 * np.pi * 220 * np.arange(fs) / fs).astype(np.float32)
    f0 = np.full(len(wav) // 256, 220.0)
    out = tmp_path / "f0.png"
    plot_f0_wav(f0, wav, fs, save_path=out)
    assert out.exists() and out.stat().st_size > 0


def test_zscore_utterance():
    rng = np.random.default_rng(0)
    tvs = {"LA": rng.standard_normal(100) * 5 + 3}
    out = zscore_utterance(tvs)
    assert abs(out["LA"].mean()) < 1e-10
    assert abs(out["LA"].std() - 1) < 1e-10


def test_speaker_onehot():
    v = speaker_onehot("F01")
    assert v.shape == (8,) and v[4] == 1.0 and v.sum() == 1.0


def test_run_logger_jsonl(tmp_path):
    import json as _json

    from aptai_tpu.utils.logging import RunLogger

    logger = RunLogger(tmp_path, "proj", use_wandb=False)
    logger.log({"loss": 1.5, "val": np.float32(0.25)}, step=3)
    logger.log({"loss": 1.2}, step=4)
    lines = [
        _json.loads(l)
        for l in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 3
    assert abs(lines[0]["val"] - 0.25) < 1e-9
    assert lines[1]["step"] == 4


def test_param_count_and_bytes():
    from aptai_tpu.utils import param_count, tree_bytes

    tree = {"a": np.zeros((2, 3), np.float32), "b": np.zeros(5, np.int32)}
    assert param_count(tree) == 11
    assert tree_bytes(tree) == 6 * 4 + 5 * 4


def test_prefetch_loader_preserves_batches(tmp_path):
    from aptai_tpu.data import PrefetchLoader

    csv_path = make_synthetic_commonphone(tmp_path, 7, 1, 1)
    df = pd.read_csv(csv_path)
    vocab = build_vocab(df.phonemes)
    ds = CommonPhoneDataset(df[df.split == "train"], vocab)
    base = BucketedLoader(ds, batch_size=4, collate_fn=collate_ctc,
                          shuffle=False)
    direct = list(base)
    prefetched = list(PrefetchLoader(
        BucketedLoader(ds, batch_size=4, collate_fn=collate_ctc,
                       shuffle=False)))
    assert len(direct) == len(prefetched) == len(base)
    for a, b in zip(direct, prefetched):
        np.testing.assert_array_equal(a["audio"], b["audio"])
        np.testing.assert_array_equal(a["phoneme_labels"], b["phoneme_labels"])


def test_commonphone_csv_builder(tmp_path):
    """C12 builder: corpus dir (per-lang train/dev/test csvs + wavs + MAUS
    grids) -> commonphone.csv manifest."""
    from aptai_tpu.data.audio_io import save_wav
    from aptai_tpu.data.commonphone import commonphone_csv, remap_speakers
    from aptai_tpu.data.textgrid import Interval, write_textgrid

    cp = tmp_path / "CP"
    (cp / "en" / "wav").mkdir(parents=True)
    (cp / "en" / "grids").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = {"train": [], "dev": [], "test": []}
    for i, split in enumerate(["train", "train", "dev", "test"]):
        name = f"utt_{i}"
        save_wav(cp / "en" / "wav" / f"{name}.wav",
                 (0.1 * rng.standard_normal(8000)).astype(np.float32), 16000)
        write_textgrid(cp / "en" / "grids" / f"{name}.TextGrid", {
            "MAU": [Interval(0.0, 0.2, "(...)"), Interval(0.2, 0.5, "a")],
            "ORT-MAU": [Interval(0.0, 0.5, "word")],
        })
        rows[split].append({"audio file": f"{name}.mp3", "id": f"spk{i % 2}"})
    for split, data in rows.items():
        pd.DataFrame(data).to_csv(cp / "en" / f"{split}.csv", index=False)

    out = commonphone_csv(str(cp), langs=["en"])
    df = pd.read_csv(out)
    assert list(df.split) == ["train", "train", "val", "test"]
    assert df.phonemes.iloc[0] == "(...) a"
    assert df.text.iloc[0] == "word"
    remap_speakers(out)
    df2 = pd.read_csv(out)
    assert set(df2.speaker) <= {0, 1}


def test_multiprocess_sharded_loader_matches_global(tmp_path):
    """Per-process disjoint row shards reassemble the single-process global
    batches exactly (multi-host DP input pipeline; VERDICT r1 next #10)."""
    csv_path = make_synthetic_commonphone(tmp_path, 9, 1, 1)
    df = pd.read_csv(csv_path)
    vocab = build_vocab(df.phonemes)
    ds = CommonPhoneDataset(df[df.split == "train"], vocab)

    def loaders():
        mk = lambda **kw: BucketedLoader(
            ds, batch_size=4, collate_fn=collate_ctc, shuffle=True, seed=3,
            **kw)
        return mk(), mk(process_index=0, process_count=2), mk(
            process_index=1, process_count=2)

    g, p0, p1 = loaders()
    n_batches = 0
    for gb, b0, b1 in zip(g, p0, p1):
        n_batches += 1
        assert b0["audio"].shape[0] == 2 and b1["audio"].shape[0] == 2
        for k in gb:
            merged = np.concatenate([b0[k], b1[k]], axis=0)
            np.testing.assert_array_equal(
                merged, gb[k], err_msg=f"shard mismatch in {k}")
    assert n_batches == len(g)

    with pytest.raises(ValueError):
        BucketedLoader(ds, batch_size=5, collate_fn=collate_ctc,
                       process_index=0, process_count=2)
