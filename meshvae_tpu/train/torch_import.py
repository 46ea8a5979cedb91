"""Import a reference PyTorch checkpoint into framework params.

Maps the reference cheb_VAE state_dict (/root/reference/models/cheb_VAE.py;
saved by main.py save_model as checkpoint['state_dict'], or a bare
initial_weight.pt) onto the flax parameter tree, so users migrating from the
reference can load their trained models directly:

  python -m meshvae_tpu.train.torch_import ref_ckpt.pt out.msgpack -c cfg

Name map (reference -> framework):
  cheb.{i}.weight [K,in,out]   -> cheb_enc_{i}/weight   (same layout)
  cheb.{i}.bias [out]          -> cheb_enc_{i}/bias
  cheb_dec.{i}.weight/.bias    -> cheb_dec_{i}/weight|bias (last conv: no bias)
  <lin>.weight [out,in]        -> <lin>/kernel (transposed), <lin>.bias -> bias
  for lin in enc_lin, dec_lin, dec_lin_2, classifier_layer, z_mean, z_log_var
  (dec_lin_1 is dead in the reference, cheb_VAE.py:165 — ignored)

cheb_GCN (cheb.{i}.*, enc_lin, cls_layer) maps analogously.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_VAE_LINEARS = ("enc_lin", "dec_lin", "dec_lin_2", "classifier_layer",
                "z_mean", "z_log_var")
_GCN_LINEARS = ("enc_lin", "cls_layer")


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def import_torch_vae_state(state_dict: dict, params: dict,
                           model_type: str = "cheb_VAE") -> dict:
    """Return a new params pytree with values from a reference state_dict.

    `params` is the flax variables dict ({"params": {...}}) of a model with
    matching architecture (used for structure/shape validation).
    """
    linears = _VAE_LINEARS if model_type == "cheb_VAE" else _GCN_LINEARS
    enc_prefix = "cheb_enc_" if model_type == "cheb_VAE" else "cheb_"
    p = {k: dict(v) for k, v in params["params"].items()}

    consumed = set()
    for name, tensor in state_dict.items():
        value = _np(tensor)
        if name.startswith("cheb."):
            idx, kind = name.split(".")[1:3]
            target = f"{enc_prefix}{idx}"
        elif name.startswith("cheb_dec."):
            idx, kind = name.split(".")[1:3]
            target = f"cheb_dec_{idx}"
        else:
            stem, _, kind = name.rpartition(".")
            if stem not in linears:
                continue  # dead params (dec_lin_1, buffers, ...)
            target = stem
            if kind == "weight":
                kind = "kernel"
                value = value.T
        if target not in p or kind not in p[target]:
            continue
        expected = tuple(p[target][kind].shape)
        if tuple(value.shape) != expected:
            raise ValueError(
                f"shape mismatch importing {name} -> {target}/{kind}: "
                f"{value.shape} vs {expected}")
        p[target][kind] = jnp.asarray(value)
        consumed.add(name)

    return {"params": p}


def main():
    import argparse

    parser = argparse.ArgumentParser(
        description="Import a reference PyTorch checkpoint")
    parser.add_argument("torch_ckpt")
    parser.add_argument("output", help="output .msgpack params file")
    parser.add_argument("-c", "--conf", required=True)
    parser.add_argument("--type", default="cheb_VAE",
                        choices=["cheb_VAE", "cheb_GCN"])
    args = parser.parse_args()

    import torch

    import jax
    from ..config import read_config
    from .checkpoint import save_params
    from .driver import build_model_and_ops

    payload = torch.load(args.torch_ckpt, map_location="cpu",
                         weights_only=False)
    state_dict = payload.get("state_dict", payload) \
        if isinstance(payload, dict) else payload

    config = read_config(args.conf)
    # A reference-trained checkpoint is only meaningful on the reference's
    # exact mesh hierarchy: force the bit-exact QSlim collapse order unless
    # the config explicitly sets the key (parse the INI for a real
    # assignment — a raw-text grep would trip over comments mentioning it)
    import configparser

    parser = configparser.RawConfigParser()
    parser.read(args.conf)
    explicit = any(key == "hierarchy_mode"
                   for section in parser.sections()
                   for key, _ in parser.items(section))
    if not explicit:
        config["hierarchy_mode"] = "reference"
        print("hierarchy_mode=reference (bit-exact reference QSlim; set "
              "hierarchy_mode in the config to override)")
    if args.type == "cheb_VAE":
        model, ops, hier, template = build_model_and_ops(config)
        from .loop import Trainer
        trainer = Trainer(model, ops, config)
        target = trainer.init_params(jax.random.key(0))
    else:
        from ..models.gcn import ChebGCN, GCNConfig
        from .crecon_driver import CreconTrainer
        model, ops, hier, template = build_model_and_ops(config)
        gcn = ChebGCN(GCNConfig.from_config(
            config, coarse_verts=hier.levels[-1],
            num_features=2 * template.v.shape[1]))
        trainer = CreconTrainer(gcn, model, ops, config)
        target = trainer.init_params(jax.random.key(0))

    params = import_torch_vae_state(state_dict, target, model_type=args.type)
    save_params(args.output, params)
    print("wrote", args.output)


if __name__ == "__main__":
    main()
