"""PyTorch-CPU baseline: the denominator for the >=10x speedup target.

The reference (ZOUKaifeng/Mesh-VAE) cannot run in this image (torch-geometric
/ torch-scatter / psbody-mesh are not installed and installs are not
allowed), so this module implements the *same math* as the reference's
training step in minimal PyTorch — ChebConv_batch's K-term recurrence
(/root/reference/nn/conv.py:557-581) with sparse Laplacian propagation,
SurfacePool sparse matmuls (nn/pool.py:13-23), the full cheb_VAE
encoder/decoder/heads (models/cheb_VAE.py) and its loss, driven by
torch.optim.Adam — written fresh (no code copied) and using torch.sparse.mm
for propagation, which is *faster* than the reference's python-level
gather/scatter message passing, so the measured baseline is a conservative
(generous-to-torch) stand-in.
"""
from __future__ import annotations

import time

import numpy as np
import torch


def _sparse(coo, dtype=torch.float32):
    coo = coo.tocoo()
    idx = torch.LongTensor(np.vstack([coo.row, coo.col]))
    val = torch.tensor(coo.data, dtype=dtype)
    return torch.sparse_coo_tensor(idx, val, coo.shape).coalesce()


class TorchChebVAE(torch.nn.Module):
    """Same-math torch implementation of the reference cheb_VAE."""

    def __init__(self, hier, filters, K, num_hidden, latent, num_classes,
                 dropout):
        super().__init__()
        from meshvae_tpu.ops.graph import normalized_neg_adjacency
        import scipy.sparse as sp

        self.n_layers = len(hier.downsample)
        chain = [3] + list(filters)
        self.chain = chain
        self.K = K

        self.lap = [_sparse(normalized_neg_adjacency(a)) for a in hier.adjacency]
        coarse_lap = normalized_neg_adjacency(hier.adjacency[-1]).tocoo()
        full = sp.csr_matrix((coarse_lap.data, (coarse_lap.row, coarse_lap.col)),
                             shape=(hier.levels[0], hier.levels[0]))
        self.lap_final = _sparse(full)
        self.down = [_sparse(d) for d in hier.downsample]
        self.up = [_sparse(u) for u in hier.upsample]

        def cheb_params(k, i, o):
            w = torch.nn.Parameter(0.1 * torch.randn(k, i, o))
            b = torch.nn.Parameter(0.1 * torch.randn(o))
            return w, b

        self.enc_w = torch.nn.ParameterList()
        self.enc_b = torch.nn.ParameterList()
        for i in range(len(chain) - 2):
            w, b = cheb_params(K[i], chain[i], chain[i + 1])
            self.enc_w.append(w)
            self.enc_b.append(b)
        self.dec_w = torch.nn.ParameterList()
        self.dec_b = torch.nn.ParameterList()
        for i in range(len(chain) - 1):
            w, b = cheb_params(K[i], chain[-i - 1], chain[-i - 2])
            self.dec_w.append(w)
            self.dec_b.append(b)

        coarse = hier.levels[-1]
        flat = coarse * chain[-1]
        self.coarse = coarse
        self.enc_lin = torch.nn.Linear(flat, num_hidden)
        self.dec_lin = torch.nn.Linear(latent + num_classes, num_hidden)
        self.dec_lin_2 = torch.nn.Linear(num_hidden, flat)
        self.classifier_layer = torch.nn.Linear(num_hidden, num_classes)
        self.z_mean = torch.nn.Linear(num_hidden + num_classes, latent)
        self.z_log_var = torch.nn.Linear(num_hidden + num_classes, latent)
        self.dropout = torch.nn.Dropout(dropout)

    @staticmethod
    def _prop(lap, x):
        # x: [B, N, F] -> L x per batch item via sparse mm on [N, B*F]
        b, n, f = x.shape
        flat = x.permute(1, 0, 2).reshape(n, b * f)
        out = torch.sparse.mm(lap, flat)
        return out.reshape(n, b, f).permute(1, 0, 2)

    def _cheb(self, x, lap, w, bias):
        out = x @ w[0]
        tx0 = x
        if w.shape[0] > 1:
            tx1 = self._prop(lap, x)
            out = out + tx1 @ w[1]
        for k in range(2, w.shape[0]):
            tx2 = 2 * self._prop(lap, tx1) - tx0
            out = out + tx2 @ w[k]
            tx0, tx1 = tx1, tx2
        if bias is not None:
            out = out + bias
        return out

    @staticmethod
    def _pool(x, mat):
        b, n, f = x.shape
        flat = x.permute(1, 0, 2).reshape(n, b * f)
        out = torch.sparse.mm(mat, flat)
        return out.reshape(mat.shape[0], b, f).permute(1, 0, 2)

    def encode_h(self, x):
        b = x.shape[0]
        for i in range(self.n_layers):
            x = torch.relu(self._cheb(x, self.lap[i], self.enc_w[i], self.enc_b[i]))
            x = self._pool(x, self.down[i])
        return self.dropout(torch.relu(self.enc_lin(x.reshape(b, -1))))

    def decode_z(self, yz):
        b = yz.shape[0]
        d = self.dropout(torch.relu(self.dec_lin(yz)))
        d = self.dropout(torch.relu(self.dec_lin_2(d)))
        d = d.reshape(b, self.coarse, self.chain[-1])
        for i in range(self.n_layers):
            d = self._pool(d, self.up[-i - 1])
            d = torch.relu(self._cheb(d, self.lap[self.n_layers - i - 1],
                                      self.dec_w[i], self.dec_b[i]))
        return self._cheb(d, self.lap_final, self.dec_w[-1], None)

    def forward_parts(self, x, y):
        h = self.encode_h(x)
        y_hat = torch.softmax(self.classifier_layer(self.dropout(h)), dim=1)
        hy = torch.cat([y, h], -1)
        mu, logvar = self.z_mean(hy), self.z_log_var(hy)
        z = torch.randn_like(mu) * torch.exp(0.5 * logvar) + mu
        recon = self.decode_z(torch.cat([y, z], -1))
        return recon, y_hat, mu, logvar, z

    @staticmethod
    def loss_from_parts(x_gt, y, recon, y_hat, mu, logvar):
        kld = -0.5 * torch.sum(1 + logvar - mu**2 - logvar.exp(), -1)
        log_sigma = 1.0009118819656134
        rec = (0.5 * ((recon - x_gt) / np.exp(log_sigma)) ** 2
               + log_sigma + 0.5 * np.log(2 * np.pi)).sum(-1).sum(-1)
        logqy = (y_hat * y).sum(-1).log()
        return (kld + rec - 2 * logqy).mean()

    def forward(self, x, y):
        recon, y_hat, mu, logvar, _ = self.forward_parts(x, y)
        return self.loss_from_parts(x, y, recon, y_hat, mu, logvar)


def measure_torch_baseline(hier, batch_size=16, steps=5, warmup=2,
                           seed=0, polygon_order=6) -> float:
    """meshes/sec of the torch-CPU train step (forward+backward+Adam)."""
    torch.manual_seed(seed)
    model = TorchChebVAE(hier, filters=[16, 16, 16, 32, 32],
                         K=[polygon_order] * 5,
                         num_hidden=512, latent=16, num_classes=2, dropout=0.2)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=5e-4)
    n0 = hier.levels[0]
    x = torch.randn(batch_size, n0, 3)
    y = torch.eye(2)[torch.randint(0, 2, (batch_size,))]

    for _ in range(warmup):
        opt.zero_grad()
        loss = model(x, y)
        loss.backward()
        opt.step()
    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        loss = model(x, y)
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


class TorchChebGCN(torch.nn.Module):
    """Same-math torch implementation of the reference cheb_GCN second stage
    (reference models/cheb_cls.py:55-114: n_layers x (ChebConv -> ReLU ->
    Pool) over 6 diff channels, flatten at filters[-2], 128-hidden head)."""

    def __init__(self, hier, filters, K, num_feature=6, hidden=128,
                 num_classes=2):
        super().__init__()
        from meshvae_tpu.ops.graph import normalized_neg_adjacency

        self.n_layers = len(hier.downsample)
        chain = [num_feature] + list(filters)
        self.chain = chain
        self.lap = [_sparse(normalized_neg_adjacency(a))
                    for a in hier.adjacency]
        self.down = [_sparse(d) for d in hier.downsample]
        self.cheb_w = torch.nn.ParameterList()
        self.cheb_b = torch.nn.ParameterList()
        for i in range(len(chain) - 2):
            self.cheb_w.append(torch.nn.Parameter(
                0.1 * torch.randn(K[i], chain[i], chain[i + 1])))
            self.cheb_b.append(torch.nn.Parameter(torch.zeros(chain[i + 1])))
        coarse = hier.levels[-1]
        self.enc_lin = torch.nn.Linear(coarse * chain[-2], hidden)
        self.cls_layer = torch.nn.Linear(hidden, num_classes)

    # same propagation/conv/pool machinery as the VAE twin
    _prop = staticmethod(TorchChebVAE._prop)
    _cheb = TorchChebVAE._cheb
    _pool = staticmethod(TorchChebVAE._pool)

    def forward(self, x):
        b = x.shape[0]
        for i in range(self.n_layers):
            x = torch.relu(self._cheb(x, self.lap[i],
                                      self.cheb_w[i], self.cheb_b[i]))
            x = self._pool(x, self.down[i])
        x = torch.relu(self.enc_lin(x.reshape(b, -1)))
        return self.cls_layer(x)


def measure_torch_inference(hier, batch_size=128, steps=5, warmup=2, seed=0,
                            polygon_order=6) -> float:
    """meshes/sec of the torch-CPU inference pipeline (BASELINE config 4):
    classify, reconstruct with the predicted label, sex-swap decode, and
    per-mesh mean/max errors, under no_grad (reference inference.py:63-157
    semantics)."""
    torch.manual_seed(seed)
    vae = TorchChebVAE(hier, filters=[16, 16, 16, 32, 32],
                       K=[polygon_order] * 5, num_hidden=512, latent=16,
                       num_classes=2, dropout=0.2)
    vae.eval()
    n0 = hier.levels[0]
    x = torch.randn(batch_size, n0, 3)
    gt = torch.randn(batch_size, n0, 3)

    def step():
        with torch.no_grad():
            h = vae.encode_h(x)
            y_hat = torch.softmax(vae.classifier_layer(h), dim=1)
            pred = torch.argmax(y_hat, dim=1)
            y = torch.eye(2)[pred]
            mu = vae.z_mean(torch.cat([y, h], -1))
            recon = vae.decode_z(torch.cat([y, mu], -1))
            oppo = vae.decode_z(torch.cat([1.0 - y, mu], -1))
            err = ((recon - gt) ** 2).sum(-1).sqrt()
            return float(err.mean()), oppo

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


class _GradReverse(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x):
        return x

    @staticmethod
    def backward(ctx, g):
        return -g


def measure_torch_joint(hier, batch_size=16, steps=5, warmup=2, seed=0,
                        polygon_order=6, latent=16, latent_split=2) -> float:
    """meshes/sec of the torch-CPU *joint* train step (BASELINE config 3):
    VAE forward + latent-split supervised/adversarial heads + live GCN on
    difference features + 3 CE terms + backward + Adam over everything —
    the same math as meshvae_tpu.models.joint."""
    torch.manual_seed(seed)
    vae = TorchChebVAE(hier, filters=[16, 16, 16, 32, 32],
                       K=[polygon_order] * 5, num_hidden=512, latent=latent,
                       num_classes=2, dropout=0.2)
    gcn = TorchChebGCN(hier, filters=[16, 16, 16, 32, 32],
                       K=[polygon_order] * 5)
    sup_head = torch.nn.Linear(latent_split, 2)
    adv_head = torch.nn.Linear(latent - latent_split, 2)
    params = (list(vae.parameters()) + list(gcn.parameters())
              + list(sup_head.parameters()) + list(adv_head.parameters()))
    opt = torch.optim.Adam(params, lr=1e-3, weight_decay=5e-4)
    ce = torch.nn.CrossEntropyLoss()

    n0 = hier.levels[0]
    x = torch.randn(batch_size, n0, 3)
    labels = torch.randint(0, 2, (batch_size,))
    y = torch.eye(2)[labels]

    def step():
        opt.zero_grad()
        recon, y_hat, mu, logvar, z = vae.forward_parts(x, y)
        base = vae.loss_from_parts(x, y, recon, y_hat, mu, logvar)
        sup = ce(sup_head(mu[:, :latent_split]), labels)
        adv = ce(adv_head(_GradReverse.apply(mu[:, latent_split:])), labels)
        recon_oppo = vae.decode_z(torch.cat([1.0 - y, z], -1))
        diff = torch.cat([x - recon_oppo, x - recon], -1)
        cls = ce(gcn(diff), labels)
        loss = base + sup + 0.1 * adv + cls
        loss.backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def measure_torch_crecon(hier, batch_size=16, steps=5, warmup=2, seed=0,
                         polygon_order=6) -> float:
    """meshes/sec of the torch-CPU crecon train step: frozen-VAE diff
    features (reference crecon.py:162-201) + GCN forward + CE + backward +
    Adam (crecon.py:65-100)."""
    torch.manual_seed(seed)
    vae = TorchChebVAE(hier, filters=[16, 16, 16, 32, 32],
                       K=[polygon_order] * 5, num_hidden=512, latent=16,
                       num_classes=2, dropout=0.2)
    vae.eval()
    gcn = TorchChebGCN(hier, filters=[16, 16, 16, 32, 32],
                       K=[polygon_order] * 5)
    opt = torch.optim.Adam(gcn.parameters(), lr=1e-4, weight_decay=5e-4)
    ce = torch.nn.CrossEntropyLoss()
    n0 = hier.levels[0]
    x = torch.randn(batch_size, n0, 3)
    labels = torch.randint(0, 2, (batch_size,))
    y = torch.eye(2)[labels]

    def estimate_diff():
        with torch.no_grad():
            h = x
            for i in range(vae.n_layers):
                h = torch.relu(vae._cheb(h, vae.lap[i], vae.enc_w[i],
                                         vae.enc_b[i]))
                h = vae._pool(h, vae.down[i])
            h = torch.relu(vae.enc_lin(h.reshape(batch_size, -1)))
            mu = vae.z_mean(torch.cat([y, h], -1))

            def decode(onehot):
                d = torch.relu(vae.dec_lin(torch.cat([onehot, mu], -1)))
                d = torch.relu(vae.dec_lin_2(d))
                d = d.reshape(batch_size, vae.coarse, vae.chain[-1])
                for i in range(vae.n_layers):
                    d = vae._pool(d, vae.up[-i - 1])
                    d = torch.relu(vae._cheb(
                        d, vae.lap[vae.n_layers - i - 1], vae.dec_w[i],
                        vae.dec_b[i]))
                return vae._cheb(d, vae.lap_final, vae.dec_w[-1], None)

            recon = decode(y)
            recon_oppo = decode(1.0 - y)
            return torch.cat([x - recon_oppo, x - recon], -1)

    def step():
        diff = estimate_diff()
        opt.zero_grad()
        loss = ce(gcn(diff), labels)
        loss.backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return batch_size * steps / dt
