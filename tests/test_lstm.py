"""BiLSTM scan vs torch nn.LSTM with packed sequences (the reference head's
exact semantics, models/modules.py:190-214)."""

import numpy as np
import jax.numpy as jnp
import torch
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

from aptai_tpu.ops import lstm, bilstm
from aptai_tpu.ops.lstm import LSTMParams


def _torch_lstm(input_dim, hidden_dim, bidirectional, seed=0):
    torch.manual_seed(seed)
    m = torch.nn.LSTM(input_dim, hidden_dim, bidirectional=bidirectional,
                      num_layers=1, batch_first=True)
    return m


def _params_from_torch(m, reverse=False):
    sfx = "_reverse" if reverse else ""
    return LSTMParams(
        w_ih=jnp.asarray(getattr(m, f"weight_ih_l0{sfx}").detach().numpy()),
        w_hh=jnp.asarray(getattr(m, f"weight_hh_l0{sfx}").detach().numpy()),
        b_ih=jnp.asarray(getattr(m, f"bias_ih_l0{sfx}").detach().numpy()),
        b_hh=jnp.asarray(getattr(m, f"bias_hh_l0{sfx}").detach().numpy()),
    )


def test_forward_lstm_matches_torch_full_length(rng):
    B, T, I, H = 2, 12, 5, 7
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    m = _torch_lstm(I, H, bidirectional=False)
    with torch.no_grad():
        want, (h_n, c_n) = m(torch.tensor(x))
    lengths = np.full(B, T, np.int32)
    got, (gh, gc) = lstm(jnp.asarray(x), jnp.asarray(lengths), _params_from_torch(m))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gh), h_n[0].numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc), c_n[0].numpy(), rtol=1e-5, atol=1e-5)


def test_bilstm_matches_torch_packed_variable_lengths(rng):
    B, T, I, H = 4, 15, 6, 5
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    lengths = np.array([15, 9, 12, 4], np.int64)
    m = _torch_lstm(I, H, bidirectional=True, seed=1)
    with torch.no_grad():
        packed = pack_padded_sequence(torch.tensor(x), torch.tensor(lengths),
                                      batch_first=True, enforce_sorted=False)
        packed_out, _ = m(packed)
        want, _ = pad_packed_sequence(packed_out, batch_first=True,
                                      total_length=T)
    got, _ = bilstm(jnp.asarray(x), jnp.asarray(lengths),
                    _params_from_torch(m, reverse=False),
                    _params_from_torch(m, reverse=True))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5,
                               atol=1e-5)


def test_bilstm_batch1_matches_unpacked(rng):
    # The reference skips packing entirely for B == 1 (modules.py:210-213).
    B, T, I, H = 1, 10, 4, 6
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    m = _torch_lstm(I, H, bidirectional=True, seed=2)
    with torch.no_grad():
        want, _ = m(torch.tensor(x))
    got, _ = bilstm(jnp.asarray(x), jnp.asarray(np.array([T], np.int32)),
                    _params_from_torch(m, reverse=False),
                    _params_from_torch(m, reverse=True))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5,
                               atol=1e-5)
