"""Behavioral torch mirror of the reference MultiModN semantics, used ONLY as
a test oracle (and by the benchmark baseline).

This is an independent, compact reimplementation of the *observable behavior*
documented in SURVEY.md §3.1/§3.2 (reference ``multimodn/multimodn.py``):
batch-granular NaN skip, ones-initialized sample counters, CE over activated
outputs, the (E+1) x D metric grids, and the err+state-change loss. It avoids
torchmetrics (unavailable here) by computing binary confusion counts directly.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchMLPEncoder(nn.Module):
    """Same topology as multimodn_tpu.encoders.MLPEncoder (state concat at the
    last layer's input, no output activation)."""

    def __init__(self, state_size, n_features, hidden, activation=F.relu):
        super().__init__()
        self.activation = activation
        dims = [n_features] + list(hidden) + [state_size]
        self.layers = nn.ModuleList()
        for i, (i_d, o_d) in enumerate(zip(dims[:-1], dims[1:])):
            in_dim = i_d + (state_size if i == len(dims) - 2 else 0)
            self.layers.append(nn.Linear(in_dim, o_d))

    def forward(self, state, x):
        for layer in self.layers[:-1]:
            x = self.activation(layer(x))
        return self.layers[-1](torch.cat([x, state], dim=1))


class TorchMIMICMLPEncoder(nn.Module):
    """Same topology as MIMICMLPEncoder (first-layer concat, dropout,
    activation on every layer)."""

    def __init__(self, state_size, n_features, hidden, dropout=0.2,
                 activation=F.relu):
        super().__init__()
        self.activation = activation
        self.drop = nn.Dropout(dropout)
        dims = [n_features + state_size] + list(hidden) + [state_size]
        self.layers = nn.ModuleList(
            nn.Linear(i, o) for i, o in zip(dims[:-1], dims[1:]))

    def forward(self, state, x):
        x = self.drop(torch.cat([x, state], dim=1))
        for layer in self.layers:
            x = self.activation(layer(x))
        return x


class TorchLSTMEncoder(nn.Module):
    """Stacked nn.LSTM fed 2-D inputs (the reference's unbatched-recurrence
    quirk #8), state concat at the last layer's input."""

    def __init__(self, state_size, n_features, hidden, activation=F.relu):
        super().__init__()
        self.activation = activation
        dims = [n_features] + list(hidden) + [state_size]
        self.layers = nn.ModuleList()
        for i, (i_d, o_d) in enumerate(zip(dims[:-1], dims[1:])):
            in_dim = i_d + (state_size if i == len(dims) - 2 else 0)
            self.layers.append(nn.LSTM(in_dim, o_d, batch_first=True))

    def forward(self, state, x):
        for layer in self.layers[:-1]:
            out, _ = layer(x)
            x = self.activation(out)
        out, _ = self.layers[-1](torch.cat([x, state], dim=1))
        return out


class TorchRNNEncoder(nn.Module):
    def __init__(self, state_size, n_features, hidden, activation=F.relu):
        super().__init__()
        self.activation = activation
        dims = [n_features] + list(hidden) + [state_size]
        self.layers = nn.ModuleList()
        for i, (i_d, o_d) in enumerate(zip(dims[:-1], dims[1:])):
            in_dim = i_d + (state_size if i == len(dims) - 2 else 0)
            self.layers.append(nn.RNN(in_dim, o_d, batch_first=True))

    def forward(self, state, x):
        for layer in self.layers[:-1]:
            out, _ = layer(x)
            x = self.activation(out)
        out, _ = self.layers[-1](torch.cat([x, state], dim=1))
        return out


class TorchClassDecoder(nn.Module):
    def __init__(self, state_size, n_classes, activation=torch.sigmoid):
        super().__init__()
        self.n_classes = n_classes
        self.fc = nn.Linear(state_size, n_classes)
        self.activation = activation

    def forward(self, state):
        return self.activation(self.fc(state))


class TorchMLPDecoder(nn.Module):
    def __init__(self, state_size, hidden, n_classes=2):
        super().__init__()
        self.n_classes = n_classes
        dims = [state_size] + list(hidden) + [n_classes]
        self.layers = nn.ModuleList(
            nn.Linear(i, o) for i, o in zip(dims[:-1], dims[1:]))

    def forward(self, x):
        for layer in self.layers[:-1]:
            x = F.relu(layer(x))
        return torch.sigmoid(self.layers[-1](x))


class TorchOracle(nn.Module):
    """Reference-semantics train/test loops (behavioral oracle)."""

    def __init__(self, state_size, encoders, decoders, err_penalty,
                 state_change_penalty):
        super().__init__()
        self.state_size = state_size
        self.encoders = nn.ModuleList(encoders)
        self.decoders = nn.ModuleList(decoders)
        self.err_penalty = err_penalty
        self.sc_penalty = 0.01 * state_change_penalty
        self.init_state = nn.Parameter(torch.randn(1, state_size))

    def _grids(self):
        E, D = len(self.encoders), len(self.decoders)
        z = lambda: np.zeros((E + 1, D))
        return z(), z(), z(), z(), z(), z()

    def _step_metrics(self, out, tgt, row, d, err, corr, tp, tn, fp, fn,
                      criterion):
        err[row][d] = criterion(out, tgt).item()
        pred = out.argmax(dim=1)
        corr[row][d] += (pred == tgt).sum().item()
        if self.decoders[d].n_classes == 2:
            p, t = pred.numpy(), tgt.numpy()
            tp[row][d] += np.sum((p == 1) & (t == 1))
            tn[row][d] += np.sum((p == 0) & (t == 0))
            fp[row][d] += np.sum((p == 1) & (t == 0))
            fn[row][d] += np.sum((p == 0) & (t == 1))
        else:
            tp[row][d] = tn[row][d] = fp[row][d] = fn[row][d] = np.nan

    def run_epoch(self, batches, criterion, optimizer=None):
        """batches: iterable of (list_of_modalities, targets). Returns the
        epoch grid dict with reference reductions (ones-init counters)."""
        train = optimizer is not None
        self.train(train)
        E, D = len(self.encoders), len(self.decoders)
        n_samples = np.ones((E + 1, 1))
        err_e = np.zeros((E + 1, D))
        sc_e = np.zeros(E)
        corr_e = np.zeros((E + 1, D))
        tp_e, tn_e, fp_e, fn_e = (np.zeros((E + 1, D)) for _ in range(4))
        n_batches = 0
        ctx = torch.enable_grad() if train else torch.no_grad()
        with ctx:
            for data, target in batches:
                n_batches += 1
                B = target.shape[0]
                n_samples[0] += B
                err = torch.zeros((E + 1, D))
                sc = torch.zeros(E)
                _, corr, tp, tn, fp, fn = self._grids()
                target = target.long()
                if train:
                    optimizer.zero_grad()
                state = self.init_state.tile(B, 1)

                for d, dec in enumerate(self.decoders):
                    out = dec(state)
                    err[0][d] = criterion(out, target[:, d])
                    self._step_metrics(out.detach(), target[:, d], 0, d,
                                       np.zeros((E + 1, D)), corr, tp, tn,
                                       fp, fn, criterion)

                for e, enc in enumerate(self.encoders):
                    x = data[e]
                    old = state.clone()
                    if torch.isnan(x).any():
                        continue
                    n_samples[e + 1] += B
                    state = enc(state, x)
                    sc[e] = ((state - old) ** 2).mean()
                    for d, dec in enumerate(self.decoders):
                        out = dec(state)
                        err[e + 1][d] = criterion(out, target[:, d])
                        self._step_metrics(out.detach(), target[:, d], e + 1,
                                           d, np.zeros((E + 1, D)), corr, tp,
                                           tn, fp, fn, criterion)

                loss = (err.sum() / (D * (E + 1)) * self.err_penalty
                        + sc.sum() / E * self.sc_penalty)
                if train:
                    loss.backward()
                    optimizer.step()

                err_e += err.detach().numpy()
                sc_e += sc.detach().numpy()
                corr_e += corr
                tp_e += tp; tn_e += tn; fp_e += fp; fn_e += fn

        err_e /= n_batches
        sc_e /= n_batches
        acc = corr_e / n_samples
        sens_den = tp_e + fn_e
        sens = np.where(sens_den == 0, 0, tp_e / np.where(sens_den == 0, 1, sens_den))
        spec_den = tn_e + fp_e
        spec = np.where(spec_den == 0, 0, tn_e / np.where(spec_den == 0, 1, spec_den))
        return {
            "loss": err_e,
            "state_change_loss": sc_e,
            "accuracy": acc,
            "sensitivity": sens,
            "specificity": spec,
            "balanced_accuracy": (sens + spec) / 2,
            "tp": tp_e, "tn": tn_e, "fp": fp_e, "fn": fn_e,
        }


    def predict(self, x_list):
        """(E+1, D, N) argmax grid, no NaN skip (reference predict,
        multimodn.py:422-458, quirk #9)."""
        E, D = len(self.encoders), len(self.decoders)
        n = x_list[0].shape[0]
        full = np.zeros((E + 1, D, n))
        with torch.no_grad():
            state = self.init_state.tile(n, 1)
            for d, dec in enumerate(self.decoders):
                full[0][d] = dec(state).argmax(dim=1).numpy()
            for e, enc in enumerate(self.encoders):
                state = enc(state, x_list[e])
                for d, dec in enumerate(self.decoders):
                    full[e + 1][d] = dec(state).argmax(dim=1).numpy()
        return full

    def get_states(self, batches):
        """Final state per sample with NaN skip (multimodn.py:460-492)."""
        outs = []
        with torch.no_grad():
            for data, target in batches:
                state = self.init_state.tile(target.shape[0], 1)
                for e, enc in enumerate(self.encoders):
                    if torch.isnan(data[e]).any():
                        continue
                    state = enc(state, data[e])
                outs.append(state.numpy())
        return np.concatenate(outs, axis=0)


# ---------------------------------------------------------------------------
# Weight transplant: JAX pytree -> torch modules
# ---------------------------------------------------------------------------

def load_dense_stack(torch_layers, jax_layers):
    for tl, jl in zip(torch_layers, jax_layers):
        tl.weight.data = torch.from_numpy(np.asarray(jl["w"]).T.copy())
        tl.bias.data = torch.from_numpy(np.asarray(jl["b"]).copy())


def load_recurrent_stack(torch_layers, jax_layers):
    for tl, jl in zip(torch_layers, jax_layers):
        tl.weight_ih_l0.data = torch.from_numpy(np.asarray(jl["w_ih"]).T.copy())
        tl.weight_hh_l0.data = torch.from_numpy(np.asarray(jl["w_hh"]).T.copy())
        tl.bias_ih_l0.data = torch.from_numpy(np.asarray(jl["b_ih"]).copy())
        tl.bias_hh_l0.data = torch.from_numpy(np.asarray(jl["b_hh"]).copy())


def transplant(oracle: TorchOracle, params: dict):
    """Copy a MultiModN-TPU parameter pytree into the torch oracle."""
    oracle.init_state.data = torch.from_numpy(
        np.asarray(params["init_state"]["value"]).copy())
    for enc, p in zip(oracle.encoders, params["encoders"]):
        if isinstance(enc, (TorchLSTMEncoder, TorchRNNEncoder)):
            load_recurrent_stack(enc.layers, p["layers"])
        else:
            load_dense_stack(
                [l for l in enc.layers if isinstance(l, nn.Linear)],
                p["layers"])
    for dec, p in zip(oracle.decoders, params["decoders"]):
        layers = [dec.fc] if hasattr(dec, "fc") else list(dec.layers)
        load_dense_stack(layers, p["layers"])
