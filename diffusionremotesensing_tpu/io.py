"""Snapshot save/load and PyTorch checkpoint import.

Snapshot semantics mirror the reference (train_diffusion_superres.py:257-308):
a single file holding the model state plus the number of epochs run, written
atomically; the training engine auto-resumes when the file exists. When EMA
smoothing is enabled, *only the EMA weights* are snapshotted (reference
:411-412,497-498) — we preserve that.

Native format: msgpack via flax.serialization, holding
{'MODEL_STATE': {'params': ..., 'batch_stats': ...}, 'EPOCHS_RUN': int}.
Files are suffixed ``.msgpack`` by convention but any path works; the torch
importer also accepts the reference's ``snapshot.pt`` so the shipped
checkpoints can be validated for output parity.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from flax.core import freeze, unfreeze


def save_snapshot(path: str, model_state: Dict[str, Any], epochs_run: int) -> None:
    """Atomically write {'MODEL_STATE', 'EPOCHS_RUN'} to ``path``."""
    payload = {
        "MODEL_STATE": jax.tree_util.tree_map(np.asarray, unfreeze(model_state)),
        "EPOCHS_RUN": int(epochs_run),
    }
    data = serialization.msgpack_serialize(payload)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_snapshot(path: str) -> Tuple[Dict[str, Any], int]:
    """Load a snapshot; returns (model_state, epochs_run).

    Accepts the native msgpack format, an orbax checkpoint directory
    (written by :class:`OrbaxSnapshotter`), and a PyTorch ``snapshot.pt``
    (auto-detected), the latter converted to flax variables via
    :func:`import_torch_state_dict`.
    """
    if os.path.isdir(path):  # orbax checkpoints are directories
        return load_snapshot_orbax(path)
    with open(path, "rb") as f:
        head = f.read(2)
    if head in (b"PK", b"\x80\x02", b"\x80\x04", b"\x80\x05"):  # torch zip / legacy pickle
        return load_torch_snapshot(path)
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = jax.tree_util.tree_map(jnp.asarray, payload["MODEL_STATE"])
    return state, int(payload["EPOCHS_RUN"])


# ---------------------------------------------------------------------------
# Orbax backend (TPU-native async checkpointing)
# ---------------------------------------------------------------------------


class OrbaxSnapshotter:
    """Async snapshot writer with the reference's snapshot SEMANTICS
    (one logical {MODEL_STATE, EPOCHS_RUN} checkpoint at a fixed path,
    auto-resume when it exists — train_diffusion_superres.py:257-308) on the
    idiomatic TPU persistence stack: an orbax CheckpointManager writes the
    tree in the background so the train loop never blocks on host IO (the
    msgpack default serializes the full state on the main thread), and
    ``max_to_keep=1`` deletes the previous checkpoint only AFTER the new one
    commits — a crash mid-write always leaves the last good snapshot intact
    (matching the msgpack path's tempfile+rename atomicity). Selected with
    ``--checkpoint_backend orbax``; the checkpoint is a DIRECTORY at ``path``
    (one step dir per save) and :func:`load_snapshot` auto-detects it.

    Multi-process: ``save``/``wait_until_finished`` are COLLECTIVE — every
    process must call them (orbax synchronizes hosts internally; only the
    primary actually writes). ``Trainer.save_snapshot`` therefore routes
    orbax saves through all ranks and rank-0-gates only the msgpack path.
    """

    def __init__(self, path: str):
        import orbax.checkpoint as ocp

        self._mgr = ocp.CheckpointManager(
            os.path.abspath(path),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1, enable_async_checkpointing=True
            ),
        )
        # The manager step is an internal MONOTONIC save counter, not the
        # epoch (EPOCHS_RUN lives in the payload and is what load_snapshot
        # returns): a resumed run re-saves the epoch it restarted from, and
        # CheckpointManager refuses same-step saves (silently skipped or
        # StepAlreadyExistsError depending on version) — which would lose
        # the rerun's weights until the next save trigger.
        latest = self._mgr.latest_step()
        self._next_step = 0 if latest is None else latest + 1

    def save(self, model_state: Dict[str, Any], epochs_run: int) -> None:
        """Non-blocking save; EPOCHS_RUN rides in the payload."""
        import orbax.checkpoint as ocp

        payload = {
            "MODEL_STATE": jax.tree_util.tree_map(np.asarray, unfreeze(model_state)),
            "EPOCHS_RUN": int(epochs_run),
        }
        self._mgr.save(self._next_step, args=ocp.args.StandardSave(payload))
        self._next_step += 1

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def load_snapshot_orbax(path: str) -> Tuple[Dict[str, Any], int]:
    """Restore the latest committed step of an :class:`OrbaxSnapshotter`
    checkpoint directory."""
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(path)) as mgr:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no committed orbax checkpoint under {path}")
        payload = mgr.restore(step)
    state = jax.tree_util.tree_map(jnp.asarray, payload["MODEL_STATE"])
    return state, int(payload["EPOCHS_RUN"])


# ---------------------------------------------------------------------------
# PyTorch checkpoint import
# ---------------------------------------------------------------------------

# Mapping from reference torch module names to our flax module paths.
# Reference naming: /root/reference/UNet_model_superres.py:266-325 (superres),
# UNet_model_SAR_TO_NDVI.py:263-321 (sar), UNet_model_generation.py:226-284.
_TORCH_TO_FLAX_PREFIX = {
    "conv0": ("conv0",),
    "LR_encoder": ("cond_encoder",),
    "SAR_encoder": ("cond_encoder",),
    "conv_upsampled_lr_img": ("conv_cond",),
    "conv_SAR_img": ("conv_cond",),
    "bottle_neck": ("bottle_neck",),
    "output": ("output",),
    "label_emb": ("label_emb",),
}


def _split_torch_key(key: str):
    key = key.replace("module.", "")  # DDP prefix strip, like the reference loader
    return key.split(".")


def _assign(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW conv weight -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _convtranspose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d IOHW weight -> HWIO kernel of the equivalent
    forward (input-dilated) conv: flip spatial taps, swap in/out channels."""
    w = w[:, :, ::-1, ::-1]  # spatial flip
    return np.transpose(w, (2, 3, 0, 1))  # (kH,kW,I,O): I=torch in, O=torch out


def _resconv_entries(flax_name: str, parts, value, params, stats):
    """Map one ResConvBlock tensor. torch children: time_mlp.{0,2}, conv1.0,
    batch_norm1/2, conv_upsampled_lr_img, conv2.0, shortcut_conv.0,
    shortcut_batch_norm."""
    child = parts[0]
    v = value
    if child == "time_mlp":
        idx, leaf = parts[1], parts[2]
        sub = "fc1" if idx == "0" else "fc2"
        if leaf == "weight":
            _assign(params, (flax_name, "time_mlp", sub, "linear", "kernel"), v.T)
        else:
            _assign(params, (flax_name, "time_mlp", sub, "linear", "bias"), v)
    elif child in ("conv1", "conv2", "shortcut_conv"):
        # nn.Sequential [conv, BN(, relu)]: index 0 is the conv; index 1 is
        # the same BatchNorm object the reference ALSO registers directly as
        # batch_norm1/2 / shortcut_batch_norm, so the state_dict carries each
        # BN tensor twice — both spellings land on the same flax BN.
        idx, leaf = parts[1], parts[2]
        if idx == "0":
            if leaf == "weight":
                _assign(params, (flax_name, child, "conv", "kernel"), _conv_kernel(v))
            elif leaf == "bias":
                _assign(params, (flax_name, child, "conv", "bias"), v)
        else:
            bn_idx = {"conv1": "BatchNorm_0", "conv2": "BatchNorm_1", "shortcut_conv": "BatchNorm_2"}[child]
            _bn_entry(params, stats, (flax_name, bn_idx), leaf, v)
    elif child in ("conv_upsampled_lr_img", "conv_SAR_img", "conv_skip"):
        # the per-block skip conv is named differently per task variant
        # (superres / SAR->NDVI / generation reference files)
        leaf = parts[1]
        if leaf == "weight":
            _assign(params, (flax_name, "conv_skip", "conv", "kernel"), _conv_kernel(v))
        else:
            _assign(params, (flax_name, "conv_skip", "conv", "bias"), v)
    elif child in ("batch_norm1", "batch_norm2", "shortcut_batch_norm"):
        bn_idx = {"batch_norm1": "BatchNorm_0", "batch_norm2": "BatchNorm_1", "shortcut_batch_norm": "BatchNorm_2"}[child]
        _bn_entry(params, stats, (flax_name, bn_idx), parts[1], v)


def _bn_entry(params, stats, path, leaf, v):
    if leaf == "weight":
        _assign(params, path + ("scale",), v)
    elif leaf == "bias":
        _assign(params, path + ("bias",), v)
    elif leaf == "running_mean":
        _assign(stats, path + ("mean",), v)
    elif leaf == "running_var":
        _assign(stats, path + ("var",), v)
    # num_batches_tracked: dropped


def _plain_conv(params, path, leaf, v, transpose=False):
    if leaf == "weight":
        kern = _convtranspose_kernel(v) if transpose else _conv_kernel(v)
        _assign(params, path + ("kernel",) if transpose else path + ("conv", "kernel"), kern)
    elif leaf == "bias":
        _assign(params, path + ("bias",) if transpose else path + ("conv", "bias"), v)


def _rrdb_entries(parts, value, params, stats):
    """cond_encoder: torch 'blocks.{i}.conv{1,2}' + 'conv_out'."""
    child = parts[0]
    if child == "blocks":
        i, conv, leaf = parts[1], parts[2], parts[3]
        _plain_conv(params, ("cond_encoder", f"block{i}", conv), leaf, value)
    elif child == "conv_out":
        _plain_conv(params, ("cond_encoder", "conv_out"), parts[1], value)


def import_torch_state_dict(state_dict) -> Dict[str, Any]:
    """Convert a reference torch state_dict to flax variables.

    Works for all three reference model classes (superres / SAR->NDVI /
    generation); unit consistency is enforced by tests that compare forward
    passes (tests/test_torch_parity.py).
    """
    params: dict = {}
    stats: dict = {}
    for key, tensor in state_dict.items():
        v = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        parts = _split_torch_key(key)
        head = parts[0]

        if head in ("conv0", "conv_upsampled_lr_img", "conv_SAR_img", "output"):
            flax = _TORCH_TO_FLAX_PREFIX[head][0]
            _plain_conv(params, (flax,), parts[1], v)
        elif head in ("LR_encoder", "SAR_encoder"):
            _rrdb_entries(parts[1:], v, params, stats)
        elif head == "label_emb":
            _assign(params, ("label_emb", "embedding"), v)
        elif head == "conv_blocks":
            _resconv_entries(f"conv_block{parts[1]}", parts[2:], v, params, stats)
        elif head == "bottle_neck":
            _resconv_entries("bottle_neck", parts[1:], v, params, stats)
        elif head == "downs":
            _plain_conv(params, (f"down{parts[1]}",), parts[2], v)
        elif head == "gating_signals":
            i = parts[1]
            if parts[2] == "conv":
                _plain_conv(params, (f"gating{i}", "conv"), parts[3], v)
            elif parts[2] == "batch_norm":
                _bn_entry(params, stats, (f"gating{i}", "BatchNorm_0"), parts[3], v)
        elif head == "attention_blocks":
            i = parts[1]
            sub = parts[2]
            if sub in ("w_g", "w_x", "psi"):
                _plain_conv(params, (f"attention{i}", sub), parts[4], v)
            elif sub == "result":
                if parts[3] == "0":  # conv
                    _plain_conv(params, (f"attention{i}", "result_conv"), parts[4], v)
                else:  # BatchNorm at index 1
                    _bn_entry(params, stats, (f"attention{i}", "BatchNorm_0"), parts[4], v)
        elif head == "ups":
            i = parts[1]
            sub = parts[2]
            if sub == "time_mlp":
                idx, leaf = parts[3], parts[4]
                fc = "fc1" if idx == "0" else "fc2"
                if leaf == "weight":
                    _assign(params, (f"up{i}", "time_mlp", fc, "linear", "kernel"), v.T)
                else:
                    _assign(params, (f"up{i}", "time_mlp", fc, "linear", "bias"), v)
            elif sub == "conv":
                _plain_conv(params, (f"up{i}", "conv"), parts[3], v)
            elif sub == "batch_norm":
                _bn_entry(params, stats, (f"up{i}", "BatchNorm_0"), parts[3], v)
            elif sub == "transform":
                leaf = parts[3]
                if leaf == "weight":
                    _assign(params, (f"up{i}", "transform", "kernel"), _convtranspose_kernel(v))
                else:
                    _assign(params, (f"up{i}", "transform", "bias"), v)
        elif head == "up_convs":
            _plain_conv(params, (f"up_conv{parts[1]}",), parts[2], v)
        else:
            raise KeyError(f"Unrecognized torch checkpoint key: {key}")

    return {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats),
    }


def load_torch_snapshot(path: str) -> Tuple[Dict[str, Any], int]:
    """Load a reference ``snapshot.pt`` {'MODEL_STATE', 'EPOCHS_RUN'}."""
    import torch

    snap = torch.load(path, map_location="cpu", weights_only=False)
    state = import_torch_state_dict(snap["MODEL_STATE"])
    return state, int(snap.get("EPOCHS_RUN", 0))


def export_torch_state_dict(variables, conditioning: str = "superres") -> Dict[str, Any]:
    """Inverse of :func:`import_torch_state_dict`: flax variables -> a torch
    state_dict loadable by the corresponding reference model class
    (strict=True — every key the reference registers is emitted, including
    the Sequential-duplicated BatchNorm spellings and num_batches_tracked).

    ``conditioning`` selects the reference's attribute names:
    'superres' -> LR_encoder/conv_upsampled_lr_img, 'sar' ->
    SAR_encoder/conv_SAR_img, 'class' -> conv_skip/label_emb.
    """
    import torch

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, Any] = {}

    def T(x):
        return torch.from_numpy(np.asarray(x).copy())

    def put_conv(torch_name, node):
        out[f"{torch_name}.weight"] = T(np.transpose(np.asarray(node["conv"]["kernel"]), (3, 2, 0, 1)))
        out[f"{torch_name}.bias"] = T(node["conv"]["bias"])

    def put_linear(torch_name, node):
        out[f"{torch_name}.weight"] = T(np.asarray(node["linear"]["kernel"]).T)
        out[f"{torch_name}.bias"] = T(node["linear"]["bias"])

    def put_bn(torch_names, pnode, snode):
        for tn in torch_names:
            out[f"{tn}.weight"] = T(pnode["scale"])
            out[f"{tn}.bias"] = T(pnode["bias"])
            out[f"{tn}.running_mean"] = T(snode["mean"])
            out[f"{tn}.running_var"] = T(snode["var"])
            out[f"{tn}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)

    def put_convtranspose(torch_name, node):
        # HWIO forward-equivalent kernel -> torch IOHW with spatial flip
        k = np.asarray(node["kernel"])[::-1, ::-1]
        out[f"{torch_name}.weight"] = T(np.transpose(k, (2, 3, 0, 1)))
        out[f"{torch_name}.bias"] = T(node["bias"])

    # fail early on a tree/conditioning mismatch (a wrong name would otherwise
    # only surface as a confusing strict-load error in torch)
    if conditioning in ("superres", "sar"):
        if "cond_encoder" not in params:
            raise KeyError(
                f"conditioning={conditioning!r} expects an image-conditioned tree "
                "(no 'cond_encoder' found — is this a generation model?)"
            )
        cond_in = np.asarray(params["cond_encoder"]["conv_out"]["conv"]["kernel"]).shape[2]
        expected = {"superres": 3, "sar": 2}[conditioning]
        if cond_in != expected:
            raise KeyError(
                f"conditioning={conditioning!r} expects a {expected}-channel condition "
                f"encoder, found {cond_in} channels — wrong variant?"
            )
    elif "cond_encoder" in params:
        raise KeyError("conditioning='class' given but the tree has an image condition encoder")

    skip_name = {
        "superres": "conv_upsampled_lr_img",
        "sar": "conv_SAR_img",
        "class": "conv_skip",
    }[conditioning]

    def put_resblock(torch_prefix, flax_name):
        p, s = params[flax_name], stats[flax_name]
        put_linear(f"{torch_prefix}.time_mlp.0", p["time_mlp"]["fc1"])
        put_linear(f"{torch_prefix}.time_mlp.2", p["time_mlp"]["fc2"])
        put_conv(f"{torch_prefix}.conv1.0", p["conv1"])
        put_conv(f"{torch_prefix}.{skip_name}", p["conv_skip"])
        put_conv(f"{torch_prefix}.conv2.0", p["conv2"])
        put_conv(f"{torch_prefix}.shortcut_conv.0", p["shortcut_conv"])
        # the reference registers each BN twice (attribute + inside Sequential)
        put_bn([f"{torch_prefix}.batch_norm1", f"{torch_prefix}.conv1.1"], p["BatchNorm_0"], s["BatchNorm_0"])
        put_bn([f"{torch_prefix}.batch_norm2", f"{torch_prefix}.conv2.1"], p["BatchNorm_1"], s["BatchNorm_1"])
        put_bn(
            [f"{torch_prefix}.shortcut_batch_norm", f"{torch_prefix}.shortcut_conv.1"],
            p["BatchNorm_2"], s["BatchNorm_2"],
        )

    put_conv("conv0", params["conv0"])
    put_conv("output", params["output"])
    if conditioning in ("superres", "sar"):
        enc_name = "LR_encoder" if conditioning == "superres" else "SAR_encoder"
        cond_conv = "conv_upsampled_lr_img" if conditioning == "superres" else "conv_SAR_img"
        put_conv(cond_conv, params["conv_cond"])
        for i in range(3):
            blk = params["cond_encoder"][f"block{i}"]
            put_conv(f"{enc_name}.blocks.{i}.conv1", blk["conv1"])
            put_conv(f"{enc_name}.blocks.{i}.conv2", blk["conv2"])
        put_conv(f"{enc_name}.conv_out", params["cond_encoder"]["conv_out"])
    if conditioning == "class" and "label_emb" in params:
        out["label_emb.weight"] = T(params["label_emb"]["embedding"])

    for i in range(3):
        put_resblock(f"conv_blocks.{i}", f"conv_block{i}")
        put_conv(f"downs.{i}", params[f"down{i}"])
    put_resblock("bottle_neck", "bottle_neck")

    for i in range(3):
        put_conv(f"gating_signals.{i}.conv", params[f"gating{i}"]["conv"])
        put_bn([f"gating_signals.{i}.batch_norm"], params[f"gating{i}"]["BatchNorm_0"], stats[f"gating{i}"]["BatchNorm_0"])
        a = params[f"attention{i}"]
        sa = stats[f"attention{i}"]
        put_conv(f"attention_blocks.{i}.w_g.0", a["w_g"])
        put_conv(f"attention_blocks.{i}.w_x.0", a["w_x"])
        put_conv(f"attention_blocks.{i}.psi.0", a["psi"])
        put_conv(f"attention_blocks.{i}.result.0", a["result_conv"])
        put_bn([f"attention_blocks.{i}.result.1"], a["BatchNorm_0"], sa["BatchNorm_0"])
        u = params[f"up{i}"]
        su = stats[f"up{i}"]
        put_linear(f"ups.{i}.time_mlp.0", u["time_mlp"]["fc1"])
        put_linear(f"ups.{i}.time_mlp.2", u["time_mlp"]["fc2"])
        put_conv(f"ups.{i}.conv", u["conv"])
        put_bn([f"ups.{i}.batch_norm"], u["BatchNorm_0"], su["BatchNorm_0"])
        put_convtranspose(f"ups.{i}.transform", u["transform"])
        put_conv(f"up_convs.{i}", params[f"up_conv{i}"])

    return out
