"""PyTorch-eager replicas of every variant's train step — the
per-variant throughput BASELINE for benchmarks/sweep.py.

The reference is a per-file eager torch loop (SURVEY.md §4.1) with a
host->device copy per batch; the mount is empty, so each replica is
written from the paper's formulas (same as the framework's loss heads)
with the reference's update structure: d_steps critic updates on fresh
batches, then one G update, two optimizers. These are SPEED baselines
(not parity oracles — tests/test_trajectory_parity*.py do parity);
they must match the reference's per-step WORK, so every replica keeps
eager per-op dispatch, per-batch indexing+clone, and the documented
per-variant optimizer settings.

torch is CPU-only in this image; the reference itself also ran CPU or
a single GPU.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

BCE = nn.BCEWithLogitsLoss()


def _G(z_dim, h, out=784):
    return nn.Sequential(nn.Linear(z_dim, h), nn.ReLU(),
                         nn.Linear(h, out), nn.Sigmoid())


def _D(in_dim, h, out=1, sigmoid_out=False):
    layers = [nn.Linear(in_dim, h), nn.LeakyReLU(0.2), nn.Linear(h, out)]
    if sigmoid_out:
        layers.append(nn.Sigmoid())
    return nn.Sequential(*layers)


def _adam(ps, lr=2e-4, betas=(0.9, 0.999)):
    return torch.optim.Adam(ps, lr=lr, betas=betas)


class _Batcher:
    """Reference-style per-batch host copy from a shuffled pool."""

    def __init__(self, x, y, batch):
        self.x, self.y, self.b = x, y, batch
        self.perm = torch.randperm(x.shape[0])
        self.k = 0

    def next(self):
        n = self.x.shape[0]
        s = (self.k * self.b) % (n - self.b)
        self.k += 1
        idx = self.perm[s:s + self.b]
        return self.x[idx].clone(), self.y[idx].clone()


def _gp(D, x_hat, lam=10.0):
    x_hat = x_hat.requires_grad_(True)
    grads = torch.autograd.grad(D(x_hat).sum(), x_hat, create_graph=True)[0]
    norms = torch.sqrt((grads * grads).sum(dim=1) + 1e-12)
    return lam * ((norms - 1.0) ** 2).mean()


def _gn_groups(c):
    """Mirror models/conv.py::gn_apply's group fallback (min(8, c),
    walked down to a divisor) so the twin stays twin-shaped at any
    conv_channels — torch's nn.GroupNorm raises on non-divisors."""
    g = min(8, c)
    while c % g:
        g -= 1
    return g


def _G_conv(z_dim, c):
    """Eager-torch twin of models/conv.py's DCGAN generator (dense
    z -> 7*7*2C, GroupNorm+ReLU, two stride-2 4x4 transposed convs,
    sigmoid) — a SPEED baseline: same ops/shapes; init scale follows
    torch defaults (ConvTranspose2d fan differs from the JAX stack's
    uniform input-fan rule, irrelevant to steps/sec)."""
    class GConv(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Linear(z_dim, 7 * 7 * 2 * c)
            self.gn0 = nn.GroupNorm(_gn_groups(2 * c), 2 * c)
            self.up1 = nn.ConvTranspose2d(2 * c, c, 4, 2, 1)
            self.gn1 = nn.GroupNorm(_gn_groups(c), c)
            self.up2 = nn.ConvTranspose2d(c, 1, 4, 2, 1)

        def forward(self, z):
            h = self.fc(z).view(-1, 2 * c, 7, 7)
            h = torch.relu(self.gn0(h))
            h = torch.relu(self.gn1(self.up1(h)))
            return torch.sigmoid(self.up2(h)).flatten(1)
    return GConv()


def _D_conv(c):
    """Eager-torch twin of models/conv.py's conv critic (two stride-2
    4x4 convs, LeakyReLU, no norm, dense head)."""
    class DConv(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(1, c, 4, 2, 1)
            self.c2 = nn.Conv2d(c, 2 * c, 4, 2, 1)
            self.fc = nn.Linear(7 * 7 * 2 * c, 1)

        def forward(self, x):
            h = torch.nn.functional.leaky_relu(
                self.c1(x.view(-1, 1, 28, 28)), 0.2)
            h = torch.nn.functional.leaky_relu(self.c2(h), 0.2)
            return self.fc(h.flatten(1))
    return DConv()


def make_replica(variant: str, cfg, x_train: np.ndarray,
                 y_train: np.ndarray):
    """Returns step(): one full G+D train step (d_steps critic updates +
    one G update), eager, reference idiom."""
    torch.manual_seed(0)
    if getattr(cfg, "arch", "mlp") == "conv":
        if variant != "nsgan":
            raise NotImplementedError(
                "conv torch replica is implemented for the headline "
                "variant (nsgan) only; the per-variant ratio story is "
                "made on the MLP stack (sweep_results.json)")
        B, ZD, C = cfg.batch_size, cfg.z_dim, cfg.conv_channels
        x = torch.from_numpy(np.ascontiguousarray(
            x_train.reshape(len(x_train), -1).astype("float32")))
        if x_train.dtype == np.uint8:
            x = x / 255.0
        bat = _Batcher(x, torch.zeros(len(x)), B)
        G, D = _G_conv(ZD, C), _D_conv(C)
        g_opt = _adam(G.parameters(), cfg.g_lr, (cfg.adam_b1, cfg.adam_b2))
        d_opt = _adam(D.parameters(), cfg.d_lr, (cfg.adam_b1, cfg.adam_b2))

        def step():
            xb, _ = bat.next()
            z = torch.randn(B, ZD)
            fake = G(z)
            d_loss = BCE(D(xb).squeeze(1), torch.ones(B)) + \
                BCE(D(fake.detach()).squeeze(1), torch.zeros(B))
            d_opt.zero_grad(); d_loss.backward(); d_opt.step()
            z = torch.randn(B, ZD)
            g_loss = BCE(D(G(z)).squeeze(1), torch.ones(B))
            g_opt.zero_grad(); g_loss.backward(); g_opt.step()
        return step
    B, H, ZD = cfg.batch_size, cfg.hidden_dim, cfg.z_dim
    x = torch.from_numpy(np.ascontiguousarray(
        x_train.reshape(len(x_train), -1).astype("float32")))
    if x_train.dtype == np.uint8:
        x = x / 255.0
    y = torch.from_numpy(y_train.astype("int64"))
    bat = _Batcher(x, y, B)

    # ----- VAE family (single objective) ------------------------------
    if variant == "vae":
        HV, LD = cfg.vae_hidden_dim, cfg.latent_dim
        trunk = nn.Sequential(nn.Linear(784, HV), nn.ReLU())
        mu_l, lv_l = nn.Linear(HV, LD), nn.Linear(HV, LD)
        dec = nn.Sequential(nn.Linear(LD, HV), nn.ReLU(),
                            nn.Linear(HV, 784))
        opt = _adam([*trunk.parameters(), *mu_l.parameters(),
                     *lv_l.parameters(), *dec.parameters()], cfg.g_lr)
        bce_none = nn.BCEWithLogitsLoss(reduction="none")

        def step():
            xb, _ = bat.next()
            h = trunk(xb)
            mu, logvar = mu_l(h), lv_l(h)
            z = mu + torch.exp(0.5 * logvar) * torch.randn_like(mu)
            recon = bce_none(dec(z), xb).sum(dim=1).mean()
            kl = (-0.5 * (1 + logvar - mu ** 2
                          - logvar.exp()).sum(dim=1)).mean()
            loss = recon + kl
            opt.zero_grad(); loss.backward(); opt.step()
        return step

    if variant == "birvae":
        HV, LD = cfg.vae_hidden_dim, cfg.latent_dim
        sigma = float(4.0 ** (-cfg.birvae_bits / LD)) ** 0.5
        trunk = nn.Sequential(nn.Linear(784, HV), nn.ReLU())
        mu_l = nn.Linear(HV, LD)
        dec = nn.Sequential(nn.Linear(LD, HV), nn.ReLU(),
                            nn.Linear(HV, 784), nn.Sigmoid())
        opt = _adam([*trunk.parameters(), *mu_l.parameters(),
                     *dec.parameters()], cfg.g_lr)

        def step():
            xb, _ = bat.next()
            mu = mu_l(trunk(xb))
            mu_hat = (mu - mu.mean(0, keepdim=True)) / torch.sqrt(
                mu.var(0, unbiased=False, keepdim=True) + 1e-5)
            z = mu_hat + sigma * torch.randn_like(mu_hat)
            loss = ((dec(z) - xb) ** 2).sum(dim=1).mean()
            opt.zero_grad(); loss.backward(); opt.step()
        return step

    if variant in ("ddpm", "flow"):
        # eager replica of losses/ddpm.py|flow.py + models/ddpm_net.py
        # (mlp): sinusoidal t-embedding -> 2-layer time MLP; two SiLU
        # hidden layers with time bias; zero-init out + input->output
        # skip. flow differs only in the bridge (linear interpolant,
        # continuous t) and the regression target (x1 - x0).
        TD, T = cfg.ddpm_time_dim, cfg.ddpm_timesteps
        betas = torch.linspace(cfg.ddpm_beta_start, cfg.ddpm_beta_end, T)
        abar = torch.cumprod(1.0 - betas, 0)
        half = TD // 2
        freqs = torch.exp(-np.log(1e4) * torch.arange(half)
                          / max(half - 1, 1))
        t0, t1 = nn.Linear(TD, TD), nn.Linear(TD, TD)
        lin_in, lin_mid = nn.Linear(784, H), nn.Linear(H, H)
        tb1, tb2 = nn.Linear(TD, H), nn.Linear(TD, H)
        out_l, skip = nn.Linear(H, 784), nn.Linear(784, 784)
        nn.init.zeros_(out_l.weight); nn.init.zeros_(out_l.bias)
        nn.init.zeros_(skip.weight); nn.init.zeros_(skip.bias)
        silu = nn.SiLU()
        mods = [t0, t1, lin_in, lin_mid, tb1, tb2, out_l, skip]
        opt = _adam([p for m in mods for p in m.parameters()], cfg.g_lr)

        def net(xt, temb_in):
            emb = t1(silu(t0(temb_in)))
            h = silu(lin_in(xt) + tb1(emb))
            h = silu(lin_mid(h) + tb2(emb))
            return out_l(h) + skip(xt)

        if variant == "flow":
            def step():
                xb, _ = bat.next()
                x1 = 2.0 * xb - 1.0
                t = torch.rand(B)
                x0 = torch.randn_like(x1)
                xt = (1.0 - t)[:, None] * x0 + t[:, None] * x1
                args = (t * 1000.0)[:, None] * freqs[None, :]
                temb = torch.cat([args.sin(), args.cos()], -1)
                loss = ((net(xt, temb) - (x1 - x0)) ** 2).mean()
                opt.zero_grad(); loss.backward(); opt.step()
            return step

        def step():
            xb, _ = bat.next()
            x0 = 2.0 * xb - 1.0
            t = torch.randint(0, T, (B,))
            eps = torch.randn_like(x0)
            a = abar[t][:, None]
            xt = a.sqrt() * x0 + (1 - a).sqrt() * eps
            args = t[:, None].float() * freqs[None, :]
            loss = ((net(xt, torch.cat([args.sin(), args.cos()], -1))
                     - eps) ** 2).mean()
            opt.zero_grad(); loss.backward(); opt.step()
        return step

    if variant in ("vqvae", "vqprior"):
        # eager replica of losses/vqvae.py (+ the joint prior CE for
        # vqprior, losses/vqprior.py): nearest-code search via the same
        # matmul-form distances, straight-through estimator, Oord Eq. 3
        # terms; the prior is the idiomatic torch causal transformer
        # (nn.TransformerEncoderLayer, norm_first/gelu — the same
        # pre-LN GPT block models/ar_prior.py hand-rolls)
        HV, K = cfg.vae_hidden_dim, cfg.vq_codebook_size
        D, L = cfg.vq_code_dim, cfg.vq_tokens
        enc = nn.Sequential(nn.Linear(784, HV), nn.ReLU(),
                            nn.Linear(HV, L * D))
        dec = nn.Sequential(nn.Linear(L * D, HV), nn.ReLU(),
                            nn.Linear(HV, 784))
        book = nn.Parameter(torch.randn(K, D) / D ** 0.5)
        params = [*enc.parameters(), *dec.parameters(), book]
        bce_none = nn.BCEWithLogitsLoss(reduction="none")
        if variant == "vqprior":
            W = cfg.vq_prior_width
            tok_emb = nn.Embedding(K + 1, W)
            pos_emb = nn.Parameter(torch.randn(L, W))
            blocks = nn.TransformerEncoder(
                nn.TransformerEncoderLayer(
                    W, cfg.vq_prior_heads, 4 * W, dropout=0.0,
                    activation="gelu", batch_first=True,
                    norm_first=True),
                cfg.vq_prior_layers)
            head = nn.Linear(W, K)
            nn.init.zeros_(head.weight); nn.init.zeros_(head.bias)
            mask = nn.Transformer.generate_square_subsequent_mask(L)
            ce = nn.CrossEntropyLoss()
            params += [*tok_emb.parameters(), pos_emb,
                       *blocks.parameters(), *head.parameters()]
        opt = _adam(params, cfg.g_lr)

        def vq_terms(xb):
            z = enc(xb).view(B, L, D)
            d2 = (book ** 2).sum(-1) - 2.0 * z @ book.t()
            idx = d2.argmin(-1)
            zq = book[idx]
            zst = z + (zq - z).detach()
            recon = bce_none(dec(zst.view(B, -1)), xb).sum(1).mean()
            codebook = ((z.detach() - zq) ** 2).sum((1, 2)).mean()
            commit = ((z - zq.detach()) ** 2).sum((1, 2)).mean()
            return recon + codebook + cfg.vq_beta * commit, idx

        if variant == "vqvae":
            def step():
                xb, _ = bat.next()
                loss, _ = vq_terms(xb)
                opt.zero_grad(); loss.backward(); opt.step()
            return step

        def step():
            xb, _ = bat.next()
            loss, idx = vq_terms(xb)
            toks = idx.detach()
            inp = torch.cat([torch.full((B, 1), K), toks[:, :-1]], 1)
            h = blocks(tok_emb(inp) + pos_emb[None], mask=mask)
            logits = head(h)
            loss = loss + ce(logits.reshape(B * L, K), toks.reshape(-1))
            opt.zero_grad(); loss.backward(); opt.step()
        return step

    # ----- adversarial family -----------------------------------------
    d_steps = max(cfg.d_steps, 1)

    if variant == "infogan":
        CAT, CONT = cfg.info_cat_dim, cfg.info_cont_dim
        G = _G(ZD + CAT + CONT, H)
        trunk = nn.Sequential(nn.Linear(784, H), nn.LeakyReLU(0.2))
        d_head = nn.Linear(H, 1)
        q_head = nn.Linear(H, CAT + 2 * CONT)
        g_opt = _adam(G.parameters(), cfg.g_lr)
        d_opt = _adam([*trunk.parameters(), *d_head.parameters(),
                       *q_head.parameters()], cfg.d_lr)
        ce = nn.CrossEntropyLoss()

        def codes():
            z = torch.randn(B, ZD)
            cat = torch.randint(0, CAT, (B,))
            oh = torch.nn.functional.one_hot(cat, CAT).float()
            cont = torch.rand(B, CONT) * 2 - 1
            return torch.cat([z, oh, cont], dim=1), cat, cont

        def mi(fake, cat, cont):
            q = q_head(trunk(fake))
            nll = (0.5 * (q[:, CAT + CONT:]
                          + (cont - q[:, CAT:CAT + CONT]) ** 2
                          / q[:, CAT + CONT:].exp())).mean()
            return ce(q[:, :CAT], cat) + nll

        def step():
            for _ in range(d_steps):
                xb, _ = bat.next()
                zc, cat, cont = codes()
                fake = G(zc).detach()
                d_loss = (BCE(d_head(trunk(xb)).squeeze(1), torch.ones(B))
                          + BCE(d_head(trunk(fake)).squeeze(1),
                                torch.zeros(B))
                          + cfg.info_lambda * mi(fake, cat, cont))
                d_opt.zero_grad(); d_loss.backward(); d_opt.step()
            zc, cat, cont = codes()
            fake = G(zc)
            g_loss = BCE(d_head(trunk(fake)).squeeze(1), torch.ones(B)) + \
                cfg.info_lambda * mi(fake, cat, cont)
            g_opt.zero_grad(); g_loss.backward(); g_opt.step()
        return step

    if variant == "began":
        G = _G(ZD, H)
        AE = nn.Sequential(nn.Linear(784, cfg.began_ae_hidden),
                           nn.LeakyReLU(0.2),
                           nn.Linear(cfg.began_ae_hidden, 784),
                           nn.Sigmoid())
        g_opt, d_opt = _adam(G.parameters(), cfg.g_lr), _adam(
            AE.parameters(), cfg.d_lr)
        state = {"k": cfg.began_k0}

        def energy(v):
            return (v - AE(v)).abs().mean(dim=1).mean()

        def step():
            for _ in range(d_steps):
                xb, _ = bat.next()
                l_real = energy(xb)
                l_fake = energy(G(torch.randn(B, ZD)).detach())
                d_loss = l_real - state["k"] * l_fake
                d_opt.zero_grad(); d_loss.backward(); d_opt.step()
            g_loss = energy(G(torch.randn(B, ZD)))
            g_opt.zero_grad(); g_loss.backward(); g_opt.step()
            state["k"] = float(np.clip(
                state["k"] + cfg.began_lambda_k
                * (cfg.began_gamma * l_real.item() - g_loss.item()),
                0.0, 1.0))
        return step

    # conditional input sizes
    g_in = ZD + (cfg.num_classes if variant == "cgan" else 0)
    d_in = 784 + (cfg.num_classes if variant == "cgan" else 0)
    G = _G(g_in, H)
    D = _D(d_in, H)
    if cfg.optimizer == "rmsprop":
        g_opt = torch.optim.RMSprop(G.parameters(), lr=cfg.g_lr)
        d_opt = torch.optim.RMSprop(D.parameters(), lr=cfg.d_lr)
    else:
        g_opt = _adam(G.parameters(), cfg.g_lr, (cfg.adam_b1, cfg.adam_b2))
        d_opt = _adam(D.parameters(), cfg.d_lr, (cfg.adam_b1, cfg.adam_b2))

    def d_update(loss):
        d_opt.zero_grad(); loss.backward(); d_opt.step()

    def g_update(loss):
        g_opt.zero_grad(); loss.backward(); g_opt.step()

    if variant in ("nsgan", "mmgan"):
        def step():
            for _ in range(d_steps):
                xb, _ = bat.next()
                fake = G(torch.randn(B, ZD)).detach()
                d_update(BCE(D(xb).squeeze(1), torch.ones(B))
                         + BCE(D(fake).squeeze(1), torch.zeros(B)))
            l_fake = D(G(torch.randn(B, ZD))).squeeze(1)
            if variant == "nsgan":
                g_update(BCE(l_fake, torch.ones(B)))
            else:  # saturating: min log(1 - D(G(z))) = -BCE(l, 0)
                g_update(-BCE(l_fake, torch.zeros(B)))
        return step

    if variant == "cgan":
        def onehot(yb):
            return torch.nn.functional.one_hot(yb, cfg.num_classes).float()

        def step():
            for _ in range(d_steps):
                xb, yb = bat.next()
                oh = onehot(yb)
                fake = G(torch.cat([torch.randn(B, ZD), oh], 1)).detach()
                d_update(
                    BCE(D(torch.cat([xb, oh], 1)).squeeze(1), torch.ones(B))
                    + BCE(D(torch.cat([fake, oh], 1)).squeeze(1),
                          torch.zeros(B)))
            oh = onehot(yb)
            fake = G(torch.cat([torch.randn(B, ZD), oh], 1))
            g_update(BCE(D(torch.cat([fake, oh], 1)).squeeze(1),
                         torch.ones(B)))
        return step

    if variant == "lsgan":
        def step():
            for _ in range(d_steps):
                xb, _ = bat.next()
                fake = G(torch.randn(B, ZD)).detach()
                d_update(0.5 * ((D(xb).squeeze(1) - 1) ** 2).mean()
                         + 0.5 * (D(fake).squeeze(1) ** 2).mean())
            g_update(0.5 * ((D(G(torch.randn(B, ZD))).squeeze(1) - 1)
                            ** 2).mean())
        return step

    if variant == "wgan":
        c = cfg.wgan_clip

        def step():
            for _ in range(d_steps):
                xb, _ = bat.next()
                fake = G(torch.randn(B, ZD)).detach()
                d_update(D(fake).mean() - D(xb).mean())
                with torch.no_grad():
                    for p in D.parameters():
                        p.clamp_(-c, c)
            g_update(-D(G(torch.randn(B, ZD))).mean())
        return step

    if variant == "wgangp":
        def step():
            for _ in range(d_steps):
                xb, _ = bat.next()
                fake = G(torch.randn(B, ZD)).detach()
                eps = torch.rand(B, 1)
                d_update(D(fake).mean() - D(xb).mean()
                         + _gp(D, eps * xb + (1 - eps) * fake,
                               cfg.gp_lambda))
            g_update(-D(G(torch.randn(B, ZD))).mean())
        return step

    if variant == "dragan":
        def step():
            for _ in range(d_steps):
                xb, _ = bat.next()
                fake = G(torch.randn(B, ZD)).detach()
                x_hat = xb + cfg.dragan_noise_scale * xb.std() \
                    * torch.rand_like(xb)
                d_update(BCE(D(xb).squeeze(1), torch.ones(B))
                         + BCE(D(fake).squeeze(1), torch.zeros(B))
                         + _gp(D, x_hat, cfg.gp_lambda))
            g_update(BCE(D(G(torch.randn(B, ZD))).squeeze(1),
                         torch.ones(B)))
        return step

    if variant == "ragan":
        def step():
            for _ in range(d_steps):
                xb, _ = bat.next()
                fake = G(torch.randn(B, ZD)).detach()
                c_r, c_f = D(xb).squeeze(1), D(fake).squeeze(1)
                d_update(BCE(c_r - c_f.mean(), torch.ones(B))
                         + BCE(c_f - c_r.mean(), torch.zeros(B)))
            fake = G(torch.randn(B, ZD))
            c_r, c_f = D(xb).squeeze(1), D(fake).squeeze(1)
            g_update(BCE(c_f - c_r.mean(), torch.ones(B))
                     + BCE(c_r - c_f.mean(), torch.zeros(B)))
        return step

    if variant == "fgan":  # jensen_shannon default pair
        softplus = nn.Softplus()

        def g_f(v):
            return float(np.log(2.0)) - softplus(-v)

        def conj(t):
            return -torch.log(2.0 - torch.exp(t))

        def step():
            for _ in range(d_steps):
                xb, _ = bat.next()
                fake = G(torch.randn(B, ZD)).detach()
                bound = g_f(D(xb).squeeze(1)).mean() - \
                    conj(g_f(D(fake).squeeze(1))).mean()
                d_update(-bound)
            g_update(-conj(g_f(D(G(torch.randn(B, ZD))).squeeze(1))).mean())
        return step

    if variant == "fishergan":
        state = {"lam": 0.0}
        rho = cfg.fisher_rho

        def step():
            for _ in range(d_steps):
                xb, _ = bat.next()
                fake = G(torch.randn(B, ZD)).detach()
                f_r, f_f = D(xb).squeeze(1), D(fake).squeeze(1)
                ipm = f_r.mean() - f_f.mean()
                omega = 0.5 * (f_r ** 2).mean() + 0.5 * (f_f ** 2).mean()
                con = 1.0 - omega
                d_update(-(ipm + state["lam"] * con - 0.5 * rho * con ** 2))
                state["lam"] -= rho * con.item()
            g_update(-D(G(torch.randn(B, ZD))).mean())
        return step

    raise ValueError(f"no torch replica for variant {variant!r}")
