"""HAIM: the parallel-fusion baseline model.

Mirrors the reference's comparison model (``pipelines/mimic/haim_api.py``):
a monolithic MLP over the concatenated features of all modalities, trained
with a single cross-entropy loss — the "P-fusion" baseline the MultiModN
paper compares against (reference README.md:9). API surface matches:
``train_epoch`` / ``test`` (returns the 15-tuple performance suite on
row-sum-normalized outputs) / ``predict``.

TPU-native implementation: one jitted program per epoch (lax.scan over
batches) with an optional fused multi-epoch ``fit`` like MultiModN's.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from multimodn_tpu.core.losses import resolve_criterion
from multimodn_tpu.core.metrics import get_performance_metrics
from multimodn_tpu.core.nn import dense_apply, mlp_init, resolve_activation
from multimodn_tpu.optim import Optimizer


class HAIMDecoder:
    """Plain MLP ``n_features -> hidden -> n_classes`` with sigmoid output
    (reference ``haim_api.py:14-36``)."""

    def __init__(self, n_features: int, hidden_layers: Sequence[int],
                 n_classes: int = 2,
                 hidden_activation: Union[str, Callable] = "relu",
                 output_activation: Union[str, Callable] = "sigmoid"):
        self.n_features = n_features
        self.n_classes = n_classes
        self.hidden_activation = resolve_activation(hidden_activation)
        self.output_activation = resolve_activation(output_activation)
        self._dims = [n_features] + list(hidden_layers) + [n_classes]

    def init(self, key) -> dict:
        return {"layers": mlp_init(key, self._dims)}

    def apply(self, params, x):
        for layer in params["layers"][:-1]:
            x = self.hidden_activation(dense_apply(layer, x))
        return self.output_activation(dense_apply(params["layers"][-1], x))


class HAIM:
    def __init__(self, decoder: HAIMDecoder, seed: int = 0):
        self.decoder = decoder
        self.params = decoder.init(jax.random.PRNGKey(seed))
        self._opt = None
        self.opt_state = None
        self._fn_cache = {}
        self._seed = seed
        self._epoch_counter = 0

    def _loss_fn(self, criterion):
        def loss_fn(params, x, targets, mask):
            out = self.decoder.apply(params, x)
            return criterion(out, targets[:, 0], mask)
        return loss_fn

    def _fit_fn(self, criterion, tx, reshuffle: bool = False):
        from multimodn_tpu.core.step import epoch_permute
        from multimodn_tpu.model import _cache_key
        # Object-keyed (strong refs): GC'd criteria cannot alias a stale
        # compiled program through id reuse (same fix as MultiModN).
        key = (_cache_key(criterion), _cache_key(tx), reshuffle)
        if key not in self._fn_cache:
            loss_fn = self._loss_fn(criterion)

            @jax.jit
            def fit(params, opt_state, data, targets, mask, epoch_ids, rng):
                def epoch_body(carry, eid):
                    params, opt_state = carry
                    if reshuffle:
                        # shuffle=True loaders keep their per-epoch
                        # semantics inside the fused program (same
                        # in-program permutation as MultiModN.fit).
                        d, t, m = epoch_permute(
                            data, targets, mask, jax.random.fold_in(rng, eid))
                    else:
                        d, t, m = data, targets, mask

                    def body(carry, xs):
                        params, opt_state = carry
                        bx, bt, bm = xs
                        loss, grads = jax.value_and_grad(loss_fn)(
                            params, bx, bt, bm)
                        updates, opt_state = tx.update(grads, opt_state, params)
                        params = jax.tree_util.tree_map(
                            lambda p, u: p + u, params, updates)
                        return (params, opt_state), loss

                    (params, opt_state), losses = jax.lax.scan(
                        body, (params, opt_state), (d, t, m))
                    return (params, opt_state), jnp.mean(losses)

                (params, opt_state), losses = jax.lax.scan(
                    epoch_body, (params, opt_state), epoch_ids)
                return params, opt_state, losses

            self._fn_cache[key] = fit
        return self._fn_cache[key]

    def _select_fit_fn(self, criterion, tx, reshuffle: bool = False):
        """Fused N-epoch train + per-epoch val scoring (AUROC+BAC) with the
        best params carried on device — HAIM counterpart of MultiModN's
        make_select_fit_fn, reproducing the reference HAIM loop
        (``mimic_single_task_pipeline.py:210-228``) in one dispatch."""
        from multimodn_tpu.core.metrics import masked_binary_auroc, safe_div

        from multimodn_tpu.model import _cache_key
        key = ("select", _cache_key(criterion), _cache_key(tx), reshuffle)
        if key in self._fn_cache:
            return self._fn_cache[key]
        from multimodn_tpu.core.step import epoch_permute
        loss_fn = self._loss_fn(criterion)
        decoder = self.decoder

        @jax.jit
        def fit(params, opt_state, x, t, m, vx, vt, vm, epoch_ids, rng,
                select_limit):
            def score(params):
                out = decoder.apply(params, vx)          # (nb, B, C)
                out = out.reshape(-1, out.shape[-1])
                norm = out / jnp.maximum(
                    jnp.sum(out, axis=1, keepdims=True), 1e-12)
                tt = vt.reshape(-1, vt.shape[-1])[:, 0]
                mm = vm.reshape(-1)
                auc = masked_binary_auroc(norm[:, 1], tt, mm)
                pred = jnp.argmax(norm, axis=1)
                tp = jnp.sum(mm * ((pred == 1) & (tt == 1)))
                tn = jnp.sum(mm * ((pred == 0) & (tt == 0)))
                fp = jnp.sum(mm * ((pred == 1) & (tt == 0)))
                fn = jnp.sum(mm * ((pred == 0) & (tt == 1)))
                bac = (safe_div(tp, tp + fn) + safe_div(tn, tn + fp)) / 2
                return auc + bac

            def epoch_body(carry, eid):
                params, opt_state, best = carry
                if reshuffle:
                    xd, td, md = epoch_permute(
                        x, t, m, jax.random.fold_in(rng, eid))
                else:
                    xd, td, md = x, t, m

                def body(carry, xs):
                    params, opt_state = carry
                    bx, bt, bm = xs
                    _, grads = jax.value_and_grad(loss_fn)(params, bx, bt, bm)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = jax.tree_util.tree_map(
                        lambda p, u: p + u, params, updates)
                    return (params, opt_state), None

                (params, opt_state), _ = jax.lax.scan(
                    body, (params, opt_state), (xd, td, md))
                s = score(params)
                best_params, best_score, best_epoch = best
                # Epochs at/after select_limit train but can never win the
                # selection (the skip_last_val quirk — see fit_best).
                improved = jnp.logical_and(s > best_score, eid < select_limit)
                best_params = jax.tree_util.tree_map(
                    lambda b, p: jnp.where(improved, p, b), best_params,
                    params)
                best = (best_params, jnp.where(improved, s, best_score),
                        jnp.where(improved, eid.astype(jnp.int32),
                                  best_epoch))
                return (params, opt_state, best), s

            # -inf so epoch 0 always wins the strictly-greater comparison
            # (constant-zero scores could otherwise silently restore the
            # untrained initial parameters — same fix as make_select_fit_fn).
            best0 = (params, jnp.full((), -jnp.inf),
                     jnp.asarray(-1, jnp.int32))
            (params, opt_state, best), scores = jax.lax.scan(
                epoch_body, (params, opt_state, best0), epoch_ids)
            return params, opt_state, best[0], best[1], best[2], scores

        self._fn_cache[key] = fit
        return fit

    def fit_best(self, train_loader, optimizer: Optimizer, criterion=None,
                 epochs: int = 1, val_loader=None,
                 restore_best: bool = True,
                 skip_last_val: bool = False) -> dict:
        """Fused multi-epoch training with on-device best-epoch selection on
        validation AUROC + balanced accuracy.

        ``skip_last_val`` reproduces the reference MNAR script's HAIM loop
        quirk: its val evaluation is indented inside the non-last-epoch
        branch (``mnar_missingness_pipeline.py:300-303``), so the LAST
        epoch's val score is never computed and the final comparison re-uses
        the stale previous score (strictly-greater -> never wins) —
        selection effectively runs over the first ``epochs - 1`` epochs
        only. With ``epochs == 1`` the reference NameErrors on the unbound
        val score; here selection simply never fires (initial params are
        restored, ``best_epoch == -1``)."""
        if val_loader is None:
            raise ValueError("fit_best requires a val_loader")
        criterion = resolve_criterion(criterion)
        if self._opt is not optimizer or self.opt_state is None:
            self._opt = optimizer
            self.opt_state = optimizer.init(self.params)
        x, t, m = self._single_modality(train_loader)
        vx, vt, vm = self._single_modality(val_loader)
        reshuffle = bool(getattr(train_loader, "shuffle", False))
        fit = self._select_fit_fn(criterion, optimizer.tx, reshuffle)
        rng = jax.random.fold_in(jax.random.PRNGKey(self._seed),
                                 self._epoch_counter)
        self._epoch_counter += epochs
        limit = jnp.asarray(epochs - 1 if skip_last_val else epochs,
                            jnp.int32)
        (self.params, self.opt_state, best_params, best_score, best_epoch,
         scores) = fit(self.params, self.opt_state, x, t, m, vx, vt, vm,
                       jnp.arange(epochs), rng, limit)
        if restore_best:
            self.params = best_params
        return {
            "best_epoch": int(best_epoch),
            "best_score": float(best_score),
            "best_params": jax.tree_util.tree_map(np.asarray, best_params),
            "scores": np.asarray(scores),
        }

    @staticmethod
    def _single_modality(loader):
        data, targets, mask = loader.stacks()
        x = data[0] if len(data) == 1 else jnp.concatenate(data, axis=-1)
        return x, targets, mask

    def train_epoch(self, train_loader, optimizer: Optimizer,
                    criterion=None, last_epoch: bool = False):
        return self.fit(train_loader, optimizer, criterion, epochs=1,
                        last_epoch=last_epoch)

    def fit(self, train_loader, optimizer: Optimizer, criterion=None,
            epochs: int = 1, last_epoch: bool = False):
        criterion = resolve_criterion(criterion)
        if self._opt is not optimizer or self.opt_state is None:
            self._opt = optimizer
            self.opt_state = optimizer.init(self.params)
        x, targets, mask = self._single_modality(train_loader)
        reshuffle = bool(getattr(train_loader, "shuffle", False))
        fit = self._fit_fn(criterion, optimizer.tx, reshuffle)
        rng = jax.random.fold_in(jax.random.PRNGKey(self._seed),
                                 self._epoch_counter)
        self._epoch_counter += epochs
        self.params, self.opt_state, _ = fit(
            self.params, self.opt_state, x, targets, mask, jnp.arange(epochs),
            rng)
        if last_epoch:
            return self.test(train_loader, criterion)
        return None

    def _epoch_outputs(self, loader):
        x, targets, mask = self._single_modality(loader)
        forward = self._fn_cache.get("forward")
        if forward is None:
            # Cache the jitted forward: a fresh closure per call would force
            # a full XLA recompile per test()/predict() invocation (~10 s
            # each through the remote-compile tunnel).
            forward = jax.jit(lambda params, x: self.decoder.apply(params, x))
            self._fn_cache["forward"] = forward
        out = np.asarray(forward(self.params, x))
        out = out.reshape(-1, out.shape[-1])
        t = np.asarray(targets).reshape(-1, targets.shape[-1])
        keep = np.asarray(mask).reshape(-1) > 0
        return out[keep], t[keep, 0]

    def test(self, test_loader, criterion=None) -> Tuple:
        out, t = self._epoch_outputs(test_loader)
        # Row-sum normalization, same as the reference (haim_api.py:107).
        out = out / out.sum(axis=1, keepdims=True)
        pred = out.argmax(axis=1)
        return get_performance_metrics(t, pred, out[:, 1])

    def predict(self, test_loader):
        out, t = self._epoch_outputs(test_loader)
        return out, t

    def state_dict(self):
        return jax.tree_util.tree_map(np.asarray, self.params)

    def load_state_dict(self, state):
        self.params = jax.tree_util.tree_map(jnp.asarray, state)
        self.opt_state = None
        self._opt = None
