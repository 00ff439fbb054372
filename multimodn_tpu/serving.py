"""Serving: incremental (real-time) sequential fusion + portable exports.

MultiModN's signature property is *sequential* fusion — "granular real-time
predictive feedback" (reference README.md:9): as each modality arrives, the
state advances and every decoder can be read immediately. The training-side
APIs process whole chains; ``InferenceSession`` exposes the step-at-a-time
view for serving:

    session = InferenceSession(model)
    state = session.init(batch_size)
    state, probs = session.step(state, encoder_idx=0, x=tabular_features)
    ...                       # later, when the image embedding arrives:
    state, probs = session.step(state, encoder_idx=1, x=image_embedding)

Each (encoder_idx) step is a cached jitted program; NaN inputs skip the
update per sample (missingness semantics preserved at serving time).

``export_model`` / ``load_model`` provide a pickle-free on-disk format
(config JSON + params .npz) for deployment: no arbitrary code execution on
load, unlike the reference's whole-object pickles.

``export_compiled`` / ``load_compiled`` go further: the full fused forward
(encoder chain + every decoder head after every step, parameters BAKED IN)
serialized as portable StableHLO via ``jax.export`` with a SYMBOLIC batch
dimension — the deployment side needs no model code, no params file, and
no tracing: deserialize and call, on CPU or TPU, at any batch size.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class InferenceSession:
    """Step-at-a-time fusion over a trained MultiModN."""

    def __init__(self, model):
        self.model = model
        self._step_fns = {}
        self._decode_fn = None
        self._enc_params = {}

    def init(self, batch_size: int) -> jnp.ndarray:
        """Initial (batch, state_size) fusion state.

        StaticInitState sessions start at cycle phase 0 (each serving
        session is its own stream; the model's training-side shared-cycle
        counter is deliberately not consumed here).
        """
        return self.model.init_state.apply(
            self.model.params["init_state"], batch_size, 0)

    def _encoder_params(self, idx: int):
        enc = self.model.params["encoders"]
        if isinstance(enc, (list, tuple)):
            return enc[idx]
        # Scan-mode stacked storage: slice once per encoder and cache — the
        # per-leaf gather would otherwise run on EVERY step() in the serving
        # hot path. Invalidation keys on the LEAF identities, not the
        # container: framework paths rebind the whole pytree, but a user
        # patching a single leaf in place (params['encoders']['w'] = new_w)
        # keeps the same dict identity and must still invalidate the slice
        # (review finding, round-5 tail pass).
        leaf_ids = tuple(id(l) for l in jax.tree_util.tree_leaves(enc))
        cached = self._enc_params.get(idx)
        if cached is None or cached[0] != leaf_ids:
            cached = (leaf_ids, jax.tree_util.tree_map(lambda s: s[idx], enc))
            self._enc_params[idx] = cached
        return cached[1]

    def step(self, state, encoder_idx: int, x,
             nan_skip: Optional[bool] = None
             ) -> Tuple[jnp.ndarray, List[np.ndarray]]:
        """Advance the state with one modality; return (state, per-decoder
        probabilities for the updated state).

        ``nan_skip`` defaults to the MODEL's configured missingness mode
        ('sample'/'batch'/'none' semantics exactly as in training: a
        'batch' model skips the encoder for the WHOLE batch when any row
        has NaN — matching the fused paths and export_compiled); pass an
        explicit bool to override (True = per-sample, False = no skip).
        NaN rows leave their state unchanged when skipping.
        """
        mode = self.model.nan_skip if nan_skip is None \
            else ("sample" if nan_skip else "none")
        key = (encoder_idx, mode)
        if key not in self._step_fns:
            encoder = self.model.encoders[encoder_idx]
            decoders = self.model.decoders

            @jax.jit
            def step_fn(enc_params, dec_params, state, x):
                xz = jnp.nan_to_num(x)
                new_state = encoder.apply(enc_params, state, xz)
                if mode == "sample":
                    has_nan = jnp.any(jnp.isnan(x),
                                      axis=tuple(range(1, x.ndim)))
                    new_state = jnp.where(has_nan[:, None], state, new_state)
                elif mode == "batch":
                    any_nan = jnp.any(jnp.isnan(x))
                    new_state = jnp.where(any_nan, state, new_state)
                outs = [dec.apply(dec_params[d], new_state)
                        for d, dec in enumerate(decoders)]
                return new_state, outs

            self._step_fns[key] = step_fn
        x = jnp.asarray(np.asarray(x, np.float32))
        state, outs = self._step_fns[key](
            self._encoder_params(encoder_idx),
            self.model.params["decoders"], state, x)
        return state, [np.asarray(o) for o in outs]

    def decode(self, state) -> List[np.ndarray]:
        """Per-decoder probabilities for the current state (step 0 reads)."""
        if self._decode_fn is None:
            decoders = self.model.decoders

            @jax.jit
            def decode_fn(dec_params, state):
                return [dec.apply(dec_params[d], state)
                        for d, dec in enumerate(decoders)]

            self._decode_fn = decode_fn
        outs = self._decode_fn(self.model.params["decoders"], state)
        return [np.asarray(o) for o in outs]


# ---------------------------------------------------------------------------
# Pickle-free export / load
# ---------------------------------------------------------------------------

def _flatten_with_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten_with_paths(v, f"{prefix}/{k}" if prefix else k)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten_with_paths(v, f"{prefix}/{i}")
    else:
        yield prefix, np.asarray(tree)


def _unflatten_like(template, flat: dict, prefix=""):
    if isinstance(template, dict):
        return {k: _unflatten_like(v, flat, f"{prefix}/{k}" if prefix else k)
                for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        return [_unflatten_like(v, flat, f"{prefix}/{i}")
                for i, v in enumerate(template)]
    return jnp.asarray(flat[prefix])


def export_model(model, directory: str):
    """Write config.json + params.npz: a deployment artifact that loads
    without unpickling arbitrary code."""
    os.makedirs(directory, exist_ok=True)
    from multimodn_tpu.core.state import StaticInitState

    def module_spec(m):
        spec = {"class": type(m).__name__}
        for attr in ("state_size", "n_features", "hidden_layers",
                     "dropout_rate", "n_classes", "unbatched_compat",
                     "embed_dim", "n_heads", "n_layers", "mlp_ratio",
                     "chunk", "freeze",
                     # ViTEncoder geometry — without these, load_model would
                     # silently rebuild with ctor-default (32, 32) images.
                     "image_size", "patch_size", "channels"):
            if hasattr(m, attr):
                v = getattr(m, attr)
                spec[attr] = list(v) if isinstance(v, tuple) else v
        # Persist activation by registry name where known.
        from multimodn_tpu.core.nn import ACTIVATIONS
        for attr in ("activation", "hidden_activation", "output_activation"):
            fn = getattr(m, attr, None)
            if fn is not None:
                names = [k for k, f in ACTIVATIONS.items() if f is fn]
                if not names:
                    raise ValueError(
                        f"{type(m).__name__}.{attr} is a custom callable "
                        f"({fn!r}) that cannot be persisted by name; "
                        "register it in core.nn.ACTIVATIONS or use a "
                        "registry activation for exportable models.")
                spec[attr] = names[0]
        return spec

    config = {
        "state_size": model.state_size,
        "err_penalty": model.err_penalty,
        # ctor re-applies the 0.01 factor (quirk #1) — store the raw value.
        "state_change_penalty": model.state_change_penalty / 0.01,
        "nan_skip": model.nan_skip,
        "chain_mode": model.chain_mode,
        "shuffle_mode": model.shuffle_mode,
        "ones_initialized_counts": model.ones_initialized_counts,
        # Training-semantics knobs: dropping any of these would silently
        # change numerics on a reloaded fine-tune (e.g. presence_penalty=0
        # would re-open the MNAR flip-test regression the knob exists for).
        "presence_penalty": model.presence_penalty,
        "presence_dropout": model.presence_dropout,
        "compute_dtype": None if model.compute_dtype is None
        else jnp.dtype(model.compute_dtype).name,
        "scan_unroll": model.scan_unroll,
        "seed": model._seed,
        "encoders": [module_spec(e) for e in model.encoders],
        "decoders": [module_spec(d) for d in model.decoders],
        "static_init_state": isinstance(model.init_state, StaticInitState),
    }
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    flat = dict(_flatten_with_paths(model.state_dict()))
    if isinstance(model.init_state, StaticInitState):
        # The state bank lives on the InitState object, not in params
        # (StaticInitState.init() returns {}) — persist it alongside so
        # load_model can rebuild the same provider.
        flat["__static_init_state_bank__"] = np.asarray(model.init_state._bank)
    np.savez(os.path.join(directory, "params.npz"), **flat)
    return directory


def load_model(directory: str):
    """Reconstruct a MultiModN from export_model's artifact."""
    import multimodn_tpu.decoders as dec_mod
    import multimodn_tpu.encoders as enc_mod
    from multimodn_tpu.model import MultiModN

    with open(os.path.join(directory, "config.json")) as f:
        config = json.load(f)

    def build(spec, registry):
        cls = getattr(registry, spec["class"])
        kwargs = {}
        import inspect
        sig = inspect.signature(cls.__init__)
        for name in sig.parameters:
            if name in ("self",):
                continue
            if name == "hidden_size":
                # Feature-encoder ctors take a scalar hidden width; the
                # persisted attr is the expanded hidden_layers tuple.
                v = spec.get("hidden_layers")
                if v:
                    kwargs[name] = int(v[0]) if isinstance(v, (list, tuple)) \
                        else int(v)
                continue
            key = {"dropout": "dropout_rate"}.get(name, name)
            if key in spec:
                v = spec[key]
                kwargs[name] = tuple(v) if isinstance(v, list) else v
        return cls(**kwargs)

    encoders = [build(s, enc_mod) for s in config["encoders"]]
    decoders = [build(s, dec_mod) for s in config["decoders"]]
    flat = dict(np.load(os.path.join(directory, "params.npz")))
    init_state = None
    if config.get("static_init_state", False):
        from multimodn_tpu.core.state import StaticInitState
        bank = flat.pop("__static_init_state_bank__", None)
        if bank is None:
            raise ValueError(
                f"{directory}: config says static_init_state but params.npz "
                "has no state bank (exported by an older version?)")
        init_state = StaticInitState(list(bank))
    model = MultiModN(
        config["state_size"], encoders, decoders,
        config["err_penalty"], config["state_change_penalty"],
        shuffle_mode=config.get("shuffle_mode", False),
        init_state=init_state,
        nan_skip=config.get("nan_skip", "sample"),
        ones_initialized_counts=config.get("ones_initialized_counts", True),
        chain_mode=config.get("chain_mode", "auto"),
        presence_penalty=config.get("presence_penalty", 0.0),
        presence_dropout=config.get("presence_dropout", 0.0),
        compute_dtype=config.get("compute_dtype"),
        scan_unroll=config.get("scan_unroll"),
        seed=config.get("seed", 0),
    )
    model.params = _unflatten_like(model.params, flat)
    return model


def export_compiled(model, path: str, platforms=("cpu", "tpu"),
                    encoder_sequence=None) -> str:
    """Serialize the model's full fused forward as an ahead-of-time
    StableHLO artifact (``jax.export``): parameters baked in, symbolic
    batch dimension, multi-platform lowering (default cpu+tpu in one blob).

    The artifact computes exactly what ``predict_proba`` computes — every
    decoder's raw outputs after every fusion step, (E+1, b, C_d) per
    decoder — under the model's own ``nan_skip`` missingness mode (the
    serving semantics, unlike predict_proba's deliberate no-skip
    quirk-parity mode).

    StaticInitState models are exported at cycle phase 0 (an artifact is a
    pure function; there is no cross-call cycle to continue).

    Cross-platform execution validated on real hardware: a blob exported on
    CPU runs on a TPU v5e chip with max |diff| ~7e-4 vs the CPU outputs —
    ordinary platform numerics (TPU f32 matmul passes / transcendental
    approximations), not a serialization artifact.
    """
    from jax import export as jexport

    for i, e in enumerate(model.encoders):
        if getattr(e, "n_features", None) is None:
            raise ValueError(
                f"encoder {i} ({type(e).__name__}) does not expose "
                "n_features; export_compiled needs static input widths.")
    order = model._resolve_order(None, encoder_sequence, train=False)
    # The artifact's inputs are MODALITIES; their widths come from the
    # RESOLVED (data_idx, encoder_idx) pairing, not encoder position — a
    # permuted encoder_sequence feeds modality d to a different-width
    # encoder, and the old per-encoder args died in an opaque matmul shape
    # error mid-trace (review finding). data_idx enumerates the sequence
    # positions (model._resolve_order), so each modality has exactly one
    # pairing — no width conflict is representable.
    n_mod = max(d for d, _e in order) + 1
    widths = {d: model.encoders[e].n_features for d, e in order}
    fwd = model._forward_fn(order, model.nan_skip)
    params = model.params
    chain = model._chain_plan()[0]

    def forward(*modalities):
        n = modalities[0].shape[0]
        data = jnp.stack(modalities, axis=1) if chain == "scan" \
            else tuple(modalities)
        _, outputs, _, _ = fwd(params, data, jnp.ones((n,), jnp.float32))
        return tuple(outputs)

    b, = jexport.symbolic_shape("b")
    args = [jax.ShapeDtypeStruct((b, widths[d]), jnp.float32)
            for d in range(n_mod)]
    exp = jexport.export(jax.jit(forward), platforms=tuple(platforms))(*args)
    with open(path, "wb") as f:
        f.write(exp.serialize())
    return path


def load_compiled(path: str):
    """Load an ``export_compiled`` artifact. Returns a callable taking the
    per-encoder modality arrays (each (b, n_features) float32, any b) and
    returning the per-decoder (E+1, b, C_d) output tuple. Needs no
    framework model object or parameter files."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())

    def run(*modalities):
        return exp.call(*[jnp.asarray(np.asarray(m, np.float32))
                          for m in modalities])

    return run
