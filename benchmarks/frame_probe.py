"""Frame-information ceiling of a frozen PR tower: linear probe FER.

Stage C (production_quality.py) trains the FORCE head over a FROZEN
from-scratch PR tower.  If that tower's frame embeddings don't encode
phone identity per frame (CTC training rewards peaky/blank-dominated
features), no alignment head can produce low frame error from them — the
honest way to read a stage-C FER is against the ceiling the features
allow.  This probe measures that ceiling directly: a single linear
softmax layer trained on the frozen ``last_transf_hidden`` of the TRAIN
speakers' utterances against the ground-truth 49 Hz frame labels,
evaluated on the HELD-OUT speaker (same split as stage C).

    python benchmarks/frame_probe.py --pr_dir /tmp/decode_identity2/pr \
        [--hprc_csv /tmp/production_quality/hprc/hprc.csv] [--steps 2000]

Output: one JSON line with train/held-out probe FER (+ majority-class
floor).  A held-out probe FER near the stage-C alignment FER means the
head is at the feature ceiling; a much lower probe FER means the head
(not the tower) is leaving accuracy on the table.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pr_dir", default="/tmp/decode_identity2/pr")
    ap.add_argument("--hprc_csv",
                    default="/tmp/production_quality/hprc/hprc.csv")
    ap.add_argument("--rate", default="N")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=0.3)
    ap.add_argument("--batch_utts", type=int, default=8)
    ap.add_argument("--layers", default="",
                    help="comma list of hidden-state indices to probe in "
                         "ONE encode pass (HF indexing: 0 = projection "
                         "output, N = final LayerNorm output).  Empty = "
                         "final only (the round-4 behavior).  The sweep "
                         "asks WHERE the tower keeps per-frame identity: "
                         "a from-scratch CTC tower warps its LAST layers "
                         "toward emission timing (early-compressed "
                         "posteriors), while earlier layers stay "
                         "acoustically local (round-5 diagnosis).")
    args = ap.parse_args()

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import pandas as pd

    from aptai_tpu.data.batching import BucketedLoader, collate_tv
    from aptai_tpu.data.hprc import HPRCDataset
    from aptai_tpu.data.vocab import load_vocab
    from aptai_tpu.infer.loader import load_model

    kind, model, params, vocab = load_model(args.pr_dir)
    assert kind == "w2v2_pr", kind
    v = len(vocab)
    layer_list = ([int(x) for x in args.layers.split(",") if x != ""]
                  or [-1])

    df = pd.read_csv(args.hprc_csv)
    held_out = str(df.speaker.iloc[0])
    if layer_list == [-1]:
        enc = jax.jit(lambda p, a, l: model.apply(
            {"params": p}, a, l, method="encode"))

        def hidden_for(out):
            return {-1: np.asarray(out["last_transf_hidden"], np.float32)}
    else:
        def _enc_all(m, a, l):
            h, fl, _, all_h = m.encoder(a, l, deterministic=True,
                                        output_hidden_states=True)
            return {"all_hidden": all_h, "frame_lengths": fl}

        enc = jax.jit(lambda p, a, l: model.apply(
            {"params": p}, a, l, method=_enc_all))

        def hidden_for(out):
            return {k: np.asarray(out["all_hidden"][k], np.float32)
                    for k in layer_list}

    def collect(rows):
        """Encode rows on device; per layer, (frames, labels) host arrays."""
        ds = HPRCDataset(rows, vocab, rate=args.rate)
        dl = BucketedLoader(ds, collate_fn=collate_tv,
                            batch_size=args.batch_utts, shuffle=False)
        xs = {k: [] for k in layer_list}
        ys = []
        for batch in dl:
            out = enc(params, jnp.asarray(batch["audio"]),
                      jnp.asarray(batch["audio_lengths"]))
            hs = hidden_for(out)
            fl = np.asarray(out["frame_lengths"])
            mask = batch.get("batch_pad_mask",
                             np.ones(len(fl), bool))
            for b in range(len(fl)):
                if not mask[b]:
                    continue
                gt = np.asarray(batch["phn_frames"][b])
                n = min(int(fl[b]), len(gt))
                keep = gt[:n] != 0  # 0 = CE ignore pad
                for k in layer_list:
                    xs[k].append(hs[k][b, :n][keep])
                ys.append(gt[:n][keep])
        return ({k: np.concatenate(v_) for k, v_ in xs.items()},
                np.concatenate(ys))

    xs_tr, y_tr = collect(df[df.speaker.astype(str) != held_out])
    xs_te, y_te = collect(df[df.speaker.astype(str) == held_out])

    # linear softmax probe per layer, full-batch-ish SGD on CPU jax
    majority = float((y_te != np.bincount(
        y_tr, minlength=v).argmax()).mean())
    with jax.default_device(jax.devices("cpu")[0]):
        for layer in layer_list:
            x_tr, x_te = xs_tr[layer], xs_te[layer]
            w = jnp.zeros((x_tr.shape[1], v))
            b = jnp.zeros((v,))
            xt, yt = jnp.asarray(x_tr), jnp.asarray(y_tr)

            @jax.jit
            def step(w, b, key, xt=xt, yt=yt):
                idx = jax.random.choice(key, len(xt), (4096,))
                xb, yb = xt[idx], yt[idx]

                def loss(w, b):
                    logits = xb @ w + b
                    lp = jax.nn.log_softmax(logits)
                    return -jnp.mean(jnp.take_along_axis(
                        lp, yb[:, None], axis=1))

                l, (gw, gb) = jax.value_and_grad(loss, argnums=(0, 1))(w, b)
                return w - args.lr * gw, b - args.lr * gb, l

            key = jax.random.PRNGKey(0)
            for i in range(args.steps):
                key, k = jax.random.split(key)
                w, b, l = step(w, b, k)

            def fer(x, y):
                pred = np.asarray(jnp.argmax(jnp.asarray(x) @ w + b, -1))
                return float((pred != y).mean())

            print(json.dumps({
                "held_out_speaker": held_out,
                "hidden_layer": layer,
                "train_frames": int(len(y_tr)),
                "heldout_frames": int(len(y_te)),
                "probe_train_FER": round(fer(x_tr, y_tr), 4),
                "probe_heldout_FER": round(fer(x_te, y_te), 4),
                "majority_class_FER": round(majority, 4),
                "final_probe_loss": round(float(l), 4),
            }), flush=True)


if __name__ == "__main__":
    main()
