"""Checkpoint save/load + one-way .pth importer.

Parity contract (reference: train.py per-epoch ``torch.save(state_dict ∪
{'mask_values'})``, loaders popping 'mask_values' before load_state_dict;
UNVERIFIED mount, SURVEY.md §5 "Checkpoint / resume"): the class-palette
``mask_values`` rides inside the checkpoint — predict needs it to render
masks. We preserve that contract: checkpoints carry params + BN state +
mask_values (+ optional optimizer/step metadata, which the reference does not
save — mirroring its weights-only resume, but optionally richer).

Format: a single ``.npz`` with keypath-flattened arrays + a JSON metadata
entry — single-file, host-portable, no directory dance needed for this model
size (31M params). The .pth importer understands torch state_dicts of the
canonical upstream U-Net by ORDER-based parsing within each block (conv
weights are the 4-D tensors; each is followed by its BN's 1-D γ/β/μ/σ²),
so it tolerates both the modern (`double_conv`) and legacy attribute naming.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.models import Params, State, UNetConfig
from tpu_unet.ops.batchnorm import BNState


def _flatten_with_paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "name", getattr(p, "idx", p))))
            for p in path
        )
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(
    path: str | Path,
    params: Params,
    state: State,
    mask_values=None,
    extra: dict | None = None,
    opt_state=None,
) -> None:
    """Write params+state (+mask_values palette, + extra JSON metadata).

    ``opt_state`` (optional) adds the optimizer pytree for full-state resume
    — the reference saves weights only (SURVEY.md §5); this is additive.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {}
    for k, v in _flatten_with_paths(params).items():
        arrays["params/" + k] = v
    for k, v in _flatten_with_paths(state).items():
        arrays["state/" + k] = v
    if opt_state is not None:
        for k, v in _flatten_with_paths(opt_state).items():
            arrays["opt/" + k] = v
    meta = {
        "mask_values": mask_values,
        "extra": extra or {},
        "has_opt_state": opt_state is not None,
    }
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    # Write through an explicit file object: bare np.savez silently appends
    # '.npz' to suffix-less paths, breaking save(path)/load(path) round-trips.
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_checkpoint(
    path: str | Path, params_like: Params, state_like: State, opt_like=None
) -> tuple[Params, State, list | None, dict]:
    """Restore into the structure of (params_like, state_like).

    Returns (params, state, mask_values, extra). With ``opt_like`` given and
    optimizer state present in the file, ``extra['opt_state']`` carries the
    restored optimizer pytree.
    """
    with np.load(Path(path), allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"].tolist()).decode("utf-8"))

        def restore(prefix, like):
            flat, treedef = jax.tree_util.tree_flatten_with_path(like)
            leaves = []
            for pth, leaf in flat:
                key = prefix + "/".join(
                    str(getattr(p, "key", getattr(p, "name", getattr(p, "idx", p))))
                    for p in pth
                )
                try:
                    arr = z[key]
                except KeyError:
                    hint = ""
                    if "/rec" in key and "/bn0/" in key:
                        hint = (" — a per-step recurrent-BN template cannot "
                                "load a shared-layout checkpoint (written "
                                "pre-r5 or with recur_bn='shared'); rebuild "
                                "with UNetConfig(recur_bn='shared')")
                    elif "/rec" in key and "/bn/" in key:
                        hint = (" — a shared recurrent-BN template cannot "
                                "load a per-step checkpoint; rebuild with "
                                "the default UNetConfig(recur_bn='per_step')")
                    raise KeyError(
                        f"checkpoint {path} has no entry {key!r}{hint}"
                    ) from None
                if arr.shape != leaf.shape:
                    raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {leaf.shape}")
                leaves.append(jnp.asarray(arr, dtype=leaf.dtype))
            return jax.tree_util.tree_unflatten(jax.tree.structure(like), leaves)

        params = restore("params/", params_like)
        state = restore("state/", state_like)
        extra = dict(meta.get("extra", {}))
        if opt_like is not None and meta.get("has_opt_state"):
            extra["opt_state"] = restore("opt/", opt_like)
    return params, state, meta.get("mask_values"), extra


def read_checkpoint_meta(path: str | Path) -> tuple[list | None, dict]:
    """Peek (mask_values, extra) without loading arrays — lets loaders build
    the right parameter template from extra['config'] before restoring."""
    with np.load(Path(path), allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"].tolist()).decode("utf-8"))
    return meta.get("mask_values"), meta.get("extra", {})


class AsyncCheckpointer:
    """Overlap checkpoint writes with training.

    The device→host fetch happens synchronously (the caller's params are
    donated into the next train step, so their buffers must be copied out
    before stepping again); the ~124 MB npz serialization + disk write then
    runs on a background thread. ``wait()`` joins the in-flight write —
    called automatically before starting the next one and at trainer exit.
    """

    def __init__(self):
        self._thread = None

    def save(self, path, params, state, mask_values=None, extra=None, opt_state=None):
        import threading

        params_h = jax.device_get(params)
        state_h = jax.device_get(state)
        opt_h = jax.device_get(opt_state) if opt_state is not None else None
        self.wait()
        self._thread = threading.Thread(
            target=save_checkpoint,
            args=(path, params_h, state_h, mask_values, extra, opt_h),
            daemon=True,
        )
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None


def average_checkpoints(paths, out_path: str | Path) -> None:
    """Uniform weight averaging over checkpoints (SWA-style; beyond-reference).

    Averages every ``params/*`` and ``state/*`` array across the input files
    and writes a standard checkpoint (loadable anywhere a per-epoch one is:
    predict/serve/evaluate/export). Tail-of-training averages are the classic
    cheap generalization lever (Izmailov et al., arXiv:1803.05407). Notes:

      * BN running stats are averaged too — an approximation (SWA proper
        re-estimates them with a data pass); for an exactly-maintained
        running average prefer the ``--ema-decay`` sibling checkpoints.
      * Optimizer state is dropped (an average of RMSprop second moments is
        not a meaningful resume point).
      * mask_values / config metadata are taken from the LAST input (the
        newest checkpoint, by call convention).
    """
    paths = [Path(p) for p in paths]
    if not paths:
        raise ValueError("average_checkpoints needs at least one input")
    sums: dict[str, np.ndarray] = {}
    dtypes: dict[str, np.dtype] = {}
    meta = None
    for p in paths:
        with np.load(p, allow_pickle=False) as z:
            meta = json.loads(bytes(z["__meta__"].tolist()).decode("utf-8"))
            keys = [k for k in z.files
                    if k.startswith(("params/", "state/"))]
            if sums and set(keys) != set(sums):
                raise ValueError(f"{p} has a different parameter tree than "
                                 f"{paths[0]} — cannot average")
            for k in keys:
                arr = z[k].astype(np.float64)  # stable accumulation
                if k in sums:
                    if arr.shape != sums[k].shape:
                        raise ValueError(
                            f"shape mismatch for {k} in {p}: "
                            f"{arr.shape} vs {sums[k].shape}")
                    sums[k] += arr
                else:
                    sums[k] = arr.copy()
                    dtypes[k] = z[k].dtype
    inv = 1.0 / len(paths)
    arrays = {k: (v * inv).astype(dtypes[k]) for k, v in sums.items()}
    extra = dict(meta.get("extra", {}))
    extra["averaged_from"] = [p.name for p in paths]
    out_meta = {"mask_values": meta.get("mask_values"), "extra": extra,
                "has_opt_state": False}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(out_meta).encode("utf-8"), dtype=np.uint8)
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "wb") as f:
        np.savez(f, **arrays)


# ---------------------------------------------------------------------------
# torch .pth importer (SURVEY.md §5: "a one-way .pth importer for parity
# testing" and for loading the reference's released Carvana weights).
# ---------------------------------------------------------------------------


def export_pth(
    path: str | Path,
    params: Params,
    state: State,
    *,
    bilinear: bool,
    mask_values: list | None = None,
) -> None:
    """Write a torch ``.pth`` the reference can ``load_state_dict`` directly.

    The inverse of :func:`import_pth`, completing torch interop in BOTH
    directions: a model trained here drops back into the reference stack
    (reference: train.py ``torch.save(state_dict() ∪ {'mask_values'})``,
    predict.py loaders — UNVERIFIED mount, SURVEY.md §5). Keys use the
    canonical upstream module naming (``inc.double_conv.0.weight``,
    ``downN.maxpool_conv.1.double_conv...``, ``upN.up`` /
    ``upN.conv.double_conv``, ``outc.conv``); layouts are transposed back
    (HWIO → OIHW convs, HW-I-O → I-O-kH-kW transposed convs) and
    ``num_batches_tracked`` is emitted as 0 (we don't track it; the
    reference never reads it outside BN-momentum warmup).
    """
    import torch

    def t(x):
        # torch.tensor copies — from_numpy would warn on JAX's read-only
        # numpy views and alias donated buffers.
        return torch.tensor(np.asarray(x))

    sd: dict = {}

    def emit_double_conv(prefix: str, p: dict, s: dict) -> None:
        # Sequential indices: 0 conv, 1 bn, 2 relu, 3 conv, 4 bn, 5 relu.
        for idx, conv, bn in (("0", "conv1", "bn1"), ("3", "conv2", "bn2")):
            bn_idx = str(int(idx) + 1)
            sd[f"{prefix}.{idx}.weight"] = t(
                np.transpose(np.asarray(p[conv]["w"]), (3, 2, 0, 1)))
            sd[f"{prefix}.{bn_idx}.weight"] = t(p[bn]["scale"])
            sd[f"{prefix}.{bn_idx}.bias"] = t(p[bn]["bias"])
            sd[f"{prefix}.{bn_idx}.running_mean"] = t(s[bn].mean)
            sd[f"{prefix}.{bn_idx}.running_var"] = t(s[bn].var)
            sd[f"{prefix}.{bn_idx}.num_batches_tracked"] = torch.tensor(
                0, dtype=torch.long)

    emit_double_conv("inc.double_conv", params["inc"], state["inc"])
    for b in ("down1", "down2", "down3", "down4"):
        emit_double_conv(f"{b}.maxpool_conv.1.double_conv", params[b], state[b])
    for b in ("up1", "up2", "up3", "up4"):
        if not bilinear:
            # ours (kH, kW, I, O) -> torch ConvTranspose2d (I, O, kH, kW)
            sd[f"{b}.up.weight"] = t(
                np.transpose(np.asarray(params[b]["up"]["w"]), (2, 3, 0, 1)))
            sd[f"{b}.up.bias"] = t(params[b]["up"]["b"])
        emit_double_conv(f"{b}.conv.double_conv",
                         params[b]["conv"], state[b]["conv"])
    sd["outc.conv.weight"] = t(
        np.transpose(np.asarray(params["outc"]["w"]), (3, 2, 0, 1)))
    sd["outc.conv.bias"] = t(params["outc"]["b"])
    if mask_values is not None:
        # The reference stores it alongside the weights and every loader
        # pops it before load_state_dict.
        sd["mask_values"] = list(mask_values)
    torch.save(sd, str(path))


def import_pth(path: str | Path, config: UNetConfig) -> tuple[Params, State, list | None]:
    """Translate a torch U-Net checkpoint into (params, state, mask_values).

    Handles the reference's layout: top-level blocks inc/down1..4/up1..4/outc;
    per DoubleConv the tensor ORDER is conv-w(4D), bn-γ, bn-β, bn-μ, bn-σ²,
    [num_batches], conv-w(4D), bn… . Up blocks prepend ConvT w(4D)+b when not
    bilinear; outc is a 1×1 conv w+b. 'mask_values' is popped first, like
    every loader in the reference does.
    """
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=False)
    mask_values = None
    if "mask_values" in sd:
        mask_values = sd.pop("mask_values")
        if hasattr(mask_values, "tolist"):
            mask_values = mask_values.tolist()

    groups: dict[str, list[tuple[str, np.ndarray]]] = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        top = k.split(".")[0]
        groups.setdefault(top, []).append((k, v.detach().numpy()))

    def parse_double_conv(tensors: list[np.ndarray]):
        assert len(tensors) == 10, f"DoubleConv expects 10 tensors, got {len(tensors)}"
        c1, g1, b1, m1, v1, c2, g2, b2, m2, v2 = tensors
        params = {
            "conv1": {"w": jnp.asarray(c1.transpose(2, 3, 1, 0))},
            "bn1": {"scale": jnp.asarray(g1), "bias": jnp.asarray(b1)},
            "conv2": {"w": jnp.asarray(c2.transpose(2, 3, 1, 0))},
            "bn2": {"scale": jnp.asarray(g2), "bias": jnp.asarray(b2)},
        }
        state = {
            "bn1": BNState(jnp.asarray(m1), jnp.asarray(v1)),
            "bn2": BNState(jnp.asarray(m2), jnp.asarray(v2)),
        }
        return params, state

    params: Params = {}
    state: State = {}
    for block in ["inc", "down1", "down2", "down3", "down4"]:
        tensors = [v for _, v in groups[block]]
        params[block], state[block] = parse_double_conv(tensors)
    for block in ["up1", "up2", "up3", "up4"]:
        tensors = [v for _, v in groups[block]]
        if config.bilinear:
            conv_p, conv_s = parse_double_conv(tensors)
            params[block], state[block] = {"conv": conv_p}, {"conv": conv_s}
        else:
            upw, upb = tensors[0], tensors[1]
            conv_p, conv_s = parse_double_conv(tensors[2:])
            params[block] = {
                # torch ConvT weight (I, O, kH, kW) -> HWIO
                "up": {"w": jnp.asarray(upw.transpose(2, 3, 0, 1)), "b": jnp.asarray(upb)},
                "conv": conv_p,
            }
            state[block] = {"conv": conv_s}
    outw, outb = [v for _, v in groups["outc"]]
    params["outc"] = {"w": jnp.asarray(outw.transpose(2, 3, 1, 0)), "b": jnp.asarray(outb)}
    return params, state, mask_values
