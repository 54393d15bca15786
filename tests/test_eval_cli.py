"""``aptai-eval`` (train/eval_cli.py): checkpoint + manifest → the
reference's test-metric suite without a trainer run."""

import dataclasses
import json

import jax
import numpy as np
import pandas as pd
import pytest

from aptai_tpu.data import make_synthetic_commonphone, make_synthetic_hprc
from aptai_tpu.data.vocab import build_vocab
from aptai_tpu.models import APTAI, ForceAPTAI, W2V2PR, tiny_config
from aptai_tpu.train.checkpoints import save_json, save_pytree
from aptai_tpu.train.eval_cli import main as eval_main

TINY = tiny_config()


def _save_ckpt(root, name, kind, params, vocab, extra=None):
    d = root / name / "best-model-ckpt"
    save_pytree(d / "params.msgpack", params)
    cfg = {"backbone": dataclasses.asdict(TINY), "vocab": vocab,
           "kind": kind}
    cfg.update(extra or {})
    save_json(d / "model_cfg.json", cfg)
    return root / name


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalcli")
    cp_csv = make_synthetic_commonphone(root / "cp", 4, 2, 2)
    hprc_csv = make_synthetic_hprc(root / "hprc", utts_per_speaker=2,
                                   cfg=TINY)
    cp_vocab = build_vocab(pd.read_csv(cp_csv).phonemes)
    hprc_vocab = build_vocab(pd.read_csv(hprc_csv).phoneme_labels)

    audio = np.zeros((1, 3200), np.float32)
    lens = np.array([3200], np.int32)
    key = jax.random.PRNGKey(0)

    pr_cfg = dataclasses.replace(TINY, vocab_size=len(cp_vocab))
    pr = W2V2PR(pr_cfg)
    pp = pr.init(key, audio, lens, np.full((1, 4), -100, np.int32))["params"]
    aptai = APTAI(TINY, num_phonemes=len(hprc_vocab))
    ap = aptai.init(key, audio, lens, method="predict")["params"]
    force = ForceAPTAI(TINY, vocab_size=len(hprc_vocab))
    fp = force.init(key, audio, lens, method="predict")["params"]

    return {
        "cp_csv": cp_csv, "hprc_csv": hprc_csv,
        "pr": _save_ckpt(root, "pr_run", "w2v2_pr", pp, cp_vocab),
        "pr_hprc": _save_ckpt(root, "pr_hprc_run", "w2v2_pr", pp,
                              hprc_vocab),
        "aptai": _save_ckpt(root, "aptai_run", "aptai", ap, hprc_vocab),
        "force": _save_ckpt(root, "force_run", "force_aptai", fp,
                            hprc_vocab, {"decode_method": "greedy"}),
    }


def _run(capsys, argv):
    rc = eval_main(argv)
    out = capsys.readouterr().out
    assert rc == 0, out
    return json.loads(out)


def test_pr_on_commonphone_split(setup, capsys):
    res = _run(capsys, [str(setup["pr"]), str(setup["cp_csv"]),
                        "--split", "test", "--decode", "greedy"])
    assert res["kind"] == "w2v2_pr"
    assert res["utterances"] == 2
    assert res["mean_cp_per"] >= 0 and np.isfinite(res["mean_cp_loss"])


def test_pr_on_hprc_rates(setup, capsys):
    res = _run(capsys, [str(setup["pr_hprc"]), str(setup["hprc_csv"])])
    # synthetic HPRC has both rates; the reference protocol scores each
    assert "mean_hprcN_per" in res and "mean_hprcF_per" in res


def test_aptai_test_dict(setup, capsys, tmp_path):
    csv = tmp_path / "m.csv"
    res = _run(capsys, [str(setup["aptai"]), str(setup["hprc_csv"]),
                        "--rate", "N", "--csv", str(csv)])
    for k in ("test_N_mean_rmse", "test_N_mean_pcc", "test_N_mean_FER",
              "test_N_mean_PER", "test_N_mean_overlap"):
        assert k in res and np.isfinite(res[k])
    assert "test_F_mean_rmse" not in res  # --rate N only
    assert csv.exists() and "test_N_mean_rmse" in csv.read_text()


def test_force_adds_ctc_seq_per(setup, capsys):
    res = _run(capsys, [str(setup["force"]), str(setup["hprc_csv"]),
                        "--rate", "N"])
    assert "test_N_ctc_seq_per" in res and res["test_N_ctc_seq_per"] >= 0


def test_speaker_filter_and_errors(setup, capsys):
    df = pd.read_csv(setup["hprc_csv"])
    spk = str(df.speaker.iloc[0])
    res = _run(capsys, [str(setup["aptai"]), str(setup["hprc_csv"]),
                        "--rate", "N", "--speaker", spk])
    assert res["utterances"] == int((df.speaker.astype(str) == spk).sum())
    # TV family on a CommonPhone manifest is a usage error, not a crash
    assert eval_main([str(setup["aptai"]), str(setup["cp_csv"])]) == 2
    # unknown split value: every row filtered away
    assert eval_main([str(setup["aptai"]), str(setup["hprc_csv"]),
                      "--split", "nope"]) == 2
    # invalid --rate values are usage errors (rc 2), not tracebacks
    assert eval_main([str(setup["aptai"]), str(setup["hprc_csv"]),
                      "--rate", "n"]) == 2
    assert eval_main([str(setup["aptai"]), str(setup["hprc_csv"]),
                      "--rate", ","]) == 2


def test_no_scored_rate_is_an_error(setup, capsys, tmp_path):
    # a manifest whose rows all miss the requested rate must not exit 0
    # with a metrics-free JSON
    df = pd.read_csv(setup["hprc_csv"])
    n_only = tmp_path / "n_only.csv"
    df[df.rate == "N"].to_csv(n_only, index=False)
    assert eval_main([str(setup["aptai"]), str(n_only), "--rate", "F"]) == 2
    err = capsys.readouterr().err
    assert "no metrics" in err
