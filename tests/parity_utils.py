"""Shared helpers for the cross-framework parity tests: copy a
TorchChebVAE's weights into a flax param tree, and run its eval-mode
forward (z = mu, dropout off) returning intermediates."""
import numpy as np
import torch

import jax.numpy as jnp


def t2n(t):
    return np.asarray(t.detach().numpy(), dtype=np.float32)


def copy_torch_weights(tmodel, params):
    """New flax variables dict with the torch twin's weights."""
    p = {k: dict(v) for k, v in params["params"].items()}
    for i in range(len(tmodel.enc_w)):
        p[f"cheb_enc_{i}"]["weight"] = jnp.asarray(t2n(tmodel.enc_w[i]))
        p[f"cheb_enc_{i}"]["bias"] = jnp.asarray(t2n(tmodel.enc_b[i]))
    for i in range(len(tmodel.dec_w)):
        p[f"cheb_dec_{i}"]["weight"] = jnp.asarray(t2n(tmodel.dec_w[i]))
        if "bias" in p[f"cheb_dec_{i}"]:
            p[f"cheb_dec_{i}"]["bias"] = jnp.asarray(t2n(tmodel.dec_b[i]))
    for name in ("enc_lin", "dec_lin", "dec_lin_2", "classifier_layer",
                 "z_mean", "z_log_var"):
        lin = getattr(tmodel, name)
        p[name]["kernel"] = jnp.asarray(t2n(lin.weight).T)
        p[name]["bias"] = jnp.asarray(t2n(lin.bias))
    return {"params": p}


def torch_eval_forward(tmodel, x, y):
    """Eval-mode forward of the torch twin returning
    (recon, y_hat, mu, logvar, h)."""
    with torch.no_grad():
        xt = torch.tensor(x)
        yt = torch.tensor(y)
        b = xt.shape[0]
        h = xt
        for i in range(tmodel.n_layers):
            h = torch.relu(tmodel._cheb(h, tmodel.lap[i], tmodel.enc_w[i],
                                        tmodel.enc_b[i]))
            h = tmodel._pool(h, tmodel.down[i])
        h = torch.relu(tmodel.enc_lin(h.reshape(b, -1)))
        y_hat = torch.softmax(tmodel.classifier_layer(h), dim=1)
        hy = torch.cat([yt, h], -1)
        mu = tmodel.z_mean(hy)
        logvar = tmodel.z_log_var(hy)
        d = torch.relu(tmodel.dec_lin(torch.cat([yt, mu], -1)))
        d = torch.relu(tmodel.dec_lin_2(d))
        d = d.reshape(b, tmodel.coarse, tmodel.chain[-1])
        for i in range(tmodel.n_layers):
            d = tmodel._pool(d, tmodel.up[-i - 1])
            d = torch.relu(tmodel._cheb(d, tmodel.lap[tmodel.n_layers - i - 1],
                                        tmodel.dec_w[i], tmodel.dec_b[i]))
        recon = tmodel._cheb(d, tmodel.lap_final, tmodel.dec_w[-1], None)
        return (recon.numpy(), y_hat.numpy(), mu.numpy(), logvar.numpy(),
                h.numpy())
