"""Checkpoint conversion: torch (diffusers / DDPM family) → Flax params.

The reference loads HF torch checkpoints directly
(/root/reference/src/utils/utils.py:56-111, :317-347); for the TPU framework
checkpoint conversion is a first-class component (SURVEY.md §5): torch
NCHW/OIHW tensors become Flax NHWC/HWIO pytrees.

Conventions converted:
    conv weight   OIHW → HWIO          (transpose 2,3,1,0)
    dense weight  (out,in) → (in,out)  (transpose)
    norm weight/bias → scale/bias
    old-diffusers attention names (query/key/value/proj_attn) → to_q/…/to_out

The mapping is expressed as a bijection on names so it can be validated
offline by synthesising a torch-style state dict from Flax params and
round-tripping (tests/test_convert.py) — no network or real checkpoint
needed; a real checkpoint drops in through the identical path.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def cast_f32_to_bf16(tree: Any) -> Any:
    """bf16 parameter storage (--weights_dtype bf16): cast every float32
    leaf, leave integer/other-dtype leaves (timestep tables, ids) alone.
    One definition for every cast site so the policy can't drift."""
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        tree,
    )


# ---- name mapping ---------------------------------------------------------

_ATTN_OLD_TO_NEW = {
    "query": "to_q",
    "key": "to_k",
    "value": "to_v",
    "proj_attn": "to_out",
    "to_out.0": "to_out",
}


def _torch_name_to_flax_path(name: str) -> Tuple[Tuple[str, ...], str]:
    """'down_blocks.0.resnets.1.conv1.weight' →
    (('down_blocks_0','resnets_1','conv1'), 'weight')."""
    parts = name.split(".")
    leaf = parts[-1]
    parts = parts[:-1]
    # old-diffusers attention projection names
    joined = ".".join(parts)
    for old, new in _ATTN_OLD_TO_NEW.items():
        if joined.endswith(old):
            joined = joined[: -len(old)] + new
    parts = joined.split(".")
    # merge list indices into linen's auto names: down_blocks.0 → down_blocks_0
    out = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    # HF module-name → our module-name
    rename = {"time_embedding": "time_mlp", "mid_block": "mid_block"}
    out = [rename.get(p, p) for p in out]
    return tuple(out), leaf


def _is_norm_path(path: Tuple[str, ...]) -> bool:
    last = path[-1]
    return "norm" in last


CLIP_STRIP_PREFIXES = ("text_model.", "embeddings.", "encoder.", "module.")


def convert_torch_state_dict(
    state_dict: Dict[str, Any],
    template_params: Dict[str, Any],
    strip_prefixes: Tuple[str, ...] = ("module.",),
) -> Dict[str, Any]:
    """Convert a torch state dict into the Flax param pytree shaped like
    ``template_params`` (from model.init). Raises on missing/shape-mismatched
    leaves so silent partial loads are impossible.

    ``strip_prefixes`` removes wrapper scopes anchored at the start of the
    name (repeatedly, so nested wrappers like 'text_model.encoder.' peel off
    one scope per pass); pass ``CLIP_STRIP_PREFIXES`` when loading HF CLIP
    text towers (their text_model./embeddings./encoder. scopes don't exist
    in our flat Flax tree). Anchoring matters: a substring match would
    silently mangle any future tower whose inner module name collides with a
    wrapper scope. The default must NOT strip 'encoder.' — the VAE genuinely
    scopes its params under encoder/decoder."""
    flat_out: Dict[Tuple[str, ...], np.ndarray] = {}

    for name, tensor in state_dict.items():
        arr = np.asarray(
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor
        )
        stripped = True
        while stripped:
            stripped = False
            for pre in strip_prefixes:
                if name.startswith(pre):
                    name = name[len(pre):]
                    stripped = True
        path, leaf = _torch_name_to_flax_path(name)
        if leaf in ("num_batches_tracked", "position_ids"):
            continue  # torch buffers with no Flax counterpart
        # VAE encoder/decoder use flat stage names:
        # encoder.down_blocks.0.resnets.1 → encoder/down_blocks_0_resnets_1
        if path and path[0] in ("encoder", "decoder"):
            merged = []
            for comp in path[1:]:
                if merged and merged[-1].split("_")[0] in ("down", "up")                         and comp.split("_")[0] in ("resnets", "downsamplers",
                                                   "upsamplers"):
                    merged[-1] = f"{merged[-1]}_{comp}"
                else:
                    merged.append(comp)
            path = (path[0],) + tuple(merged)
        # downsamplers_0 / upsamplers_0 keep an inner 'conv' module (also as
        # the suffix of merged VAE stage names)
        if path and path[-1].endswith(("downsamplers_0", "upsamplers_0")):
            path = path + ("conv",)
        # ADM with resblock_updown=False: the plain Downsample/Upsample
        # modules store their conv as '.op'/'.conv'
        # (guided_diffusion/unet.py Downsample/Upsample ≡ improved_diffusion
        # unet.py:53-110); our UNetADM names the conv input_blocks_N_0 /
        # output_blocks_N_M directly, so drop the torch sub-name
        if (len(path) >= 2 and path[-1] in ("op", "conv")
                and re.fullmatch(r"(?:input|output)_blocks_\d+_\d+",
                                 path[-2])):
            path = path[:-1]
        if leaf == "positional_embedding" and arr.ndim == 2:
            # AttentionPool2d stores (C, S+1); our param is (S+1, C)
            # (guided_diffusion/unet.py:36-38)
            flat_out[path + (leaf,)] = arr.T
        elif path and (path[-1].endswith("_embedding")
                       or path[-1] == "label_emb") and leaf == "weight":
            # nn.Embed tables keep (vocab, dim) orientation (label_emb is
            # ADM's class embedding, guided_diffusion/unet.py:475)
            flat_out[path + ("embedding",)] = arr
        elif _is_norm_path(path) or (leaf == "weight" and arr.ndim == 1):
            # explicit *norm* names OR any 1-D weight (ADM's in_layers_0 /
            # out_layers_0 GroupNorms carry no 'norm' in their name)
            flax_leaf = "scale" if leaf == "weight" else "bias"
            flat_out[path + (flax_leaf,)] = arr
        elif leaf == "weight":
            if arr.ndim == 4:  # conv OIHW → HWIO
                flat_out[path + ("kernel",)] = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 3:
                # 1-D conv (out, in, 1) — ADM/guided-diffusion stores its
                # attention qkv/proj as conv_nd(1, ...); our ADM blocks use
                # Dense, so squeeze + transpose to (in, out)
                flat_out[path + ("kernel",)] = arr[:, :, 0].T
            elif arr.ndim == 2:  # dense (out,in) → (in,out)
                flat_out[path + ("kernel",)] = arr.T
            else:
                flat_out[path + ("kernel",)] = arr
        else:
            flat_out[path + (leaf,)] = arr

    # pour into the template structure
    def fill(template, prefix: Tuple[str, ...]):
        if isinstance(template, dict):
            return {k: fill(v, prefix + (k,)) for k, v in template.items()}
        key = prefix
        if key not in flat_out:
            raise KeyError(f"checkpoint missing parameter {'/'.join(key)}")
        arr = flat_out.pop(key)
        if tuple(arr.shape) != tuple(template.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(key)}: "
                f"checkpoint {arr.shape} vs model {template.shape}"
            )
        return jnp.asarray(arr, dtype=template.dtype)

    inner = template_params["params"] if "params" in template_params else template_params
    filled = fill(inner, ())
    leftover = [k for k in flat_out if not _ignorable(k)]
    if leftover:
        raise KeyError(
            f"checkpoint has {len(leftover)} unconsumed tensors, e.g. "
            f"{'/'.join(leftover[0])}"
        )
    return {"params": filled} if "params" in template_params else filled


def _ignorable(path: Tuple[str, ...]) -> bool:
    """Tensors legitimately absent from the Flax tree (EMA shadows, step
    counters, position ids)."""
    tail = path[-1] if path else ""
    return tail in ("num_batches_tracked", "position_ids") or "ema" in path[0].lower()


# ---- inverse direction (for offline round-trip validation) ----------------

# module-list stems whose Flax auto-name digit suffixes expand back to the
# torch '.N.' form on export — covers diffusers (blocks/resnets/attentions/
# samplers/transformer_blocks/ff.net), HF CLIP (encoder.layers), and the ADM
# torch Sequentials (input/output/middle blocks, time_embed, in/out/emb
# layers, classifier 'out' head). Names like time_embedding.linear_1 and
# add_embedding.linear_2 are REAL torch module names and must not expand.
_EXPAND_STEMS = {
    "down_blocks", "up_blocks", "resnets", "attentions", "downsamplers",
    "upsamplers", "transformer_blocks", "net", "layers", "input_blocks",
    "output_blocks", "middle_block", "time_embed", "in_layers", "out_layers",
    "emb_layers", "out",
}


def _expand_list_indices(comp: str):
    """'transformer_blocks_0' → ['transformer_blocks', '0'];
    'input_blocks_4_1' → ['input_blocks', '4', '1'] (double Sequential)."""
    suffix = []
    while True:
        m = re.match(r"(.+)_(\d+)$", comp)
        if not m:
            break
        stem = m.group(1)
        if stem in _EXPAND_STEMS or re.fullmatch(
                r"(?:input_blocks|output_blocks)_\d+", stem):
            suffix.insert(0, m.group(2))
            comp = stem
        else:
            break
    return [comp] + suffix


def flax_params_to_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Synthesize the torch-layout state dict for a Flax param tree —
    the converter's exact inverse, used to validate the mapping without a
    real checkpoint (and to export back to torch/diffusers)."""
    inner = params["params"] if "params" in params else params
    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
            return
        arr = np.asarray(node)
        mods, leaf = path[:-1], path[-1]
        # split VAE flat stage names back: down_blocks_0_resnets_1 →
        # down_blocks.0.resnets.1
        if mods and mods[0] in ("encoder", "decoder"):
            expanded = [mods[0]]
            for comp in mods[1:]:
                m2 = re.fullmatch(
                    r"(down_blocks|up_blocks)_(\d+)_"
                    r"(resnets|downsamplers|upsamplers)_(\d+)", comp
                )
                if m2:
                    expanded += [f"{m2.group(1)}_{m2.group(2)}",
                                 f"{m2.group(3)}_{m2.group(4)}"]
                else:
                    expanded.append(comp)
            mods = tuple(expanded)
        # strip the inner 'conv' of samplers back to HF naming
        if len(mods) >= 2 and mods[-2] in ("downsamplers_0", "upsamplers_0") and mods[-1] == "conv":
            mods = mods[:-1]
        # ADM plain Downsample/Upsample (resblock_updown=False): our conv
        # sits directly at input_blocks_N_0 / output_blocks_N_M; torch nests
        # it as '.op' / '.conv' (the input stem input_blocks_0_0 is a direct
        # conv on both sides and must NOT gain the sub-name)
        if len(mods) == 1 and leaf in ("kernel", "bias"):
            if (re.fullmatch(r"input_blocks_\d+_\d+", mods[0])
                    and mods[0] != "input_blocks_0_0"):
                mods = mods + ("op",)
            elif re.fullmatch(r"output_blocks_\d+_\d+", mods[0]):
                mods = mods + ("conv",)
        name_parts = []
        for p in mods:
            name_parts += _expand_list_indices(p)
        name_parts = ["time_embedding" if p == "time_mlp" else p for p in name_parts]
        base = ".".join(name_parts)
        if leaf == "positional_embedding":
            out[base + "." + leaf] = arr.T          # back to torch (C, S+1)
        elif leaf == "embedding":
            out[base + ".weight"] = arr
        elif leaf == "scale":
            out[base + ".weight"] = arr
        elif leaf == "bias":
            out[base + ".bias"] = arr
        elif leaf == "kernel":
            if arr.ndim == 4:
                out[base + ".weight"] = arr.transpose(3, 2, 0, 1)
            else:
                out[base + ".weight"] = arr.T
        else:
            out[base + "." + leaf] = arr

    walk(inner, ())
    return out


# ---- file loading ---------------------------------------------------------

def load_torch_checkpoint_file(path: str) -> Dict[str, Any]:
    """Load .bin/.pt/.ckpt (torch.load) or .safetensors."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj


def load_unet2d_torch_checkpoint(path: str, model, example_x, example_t=0.0):
    """Convenience: init the Flax template and pour a torch checkpoint in."""
    import jax

    template = jax.eval_shape(
        lambda k: model.init(k, example_x, jnp.float32(example_t)),
        jax.random.key(0),
    )
    template = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), template
    )
    sd = load_torch_checkpoint_file(path)
    return convert_torch_state_dict(sd, template)
