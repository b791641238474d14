"""Independent fp32 torch implementation of the EAGLE3 TTT semantics,
used as the parity oracle for the JAX implementation.

This mirrors the *behavior* documented in SURVEY.md §3.4 (teacher projection,
branch-cache attention with per-branch diagonal logits, joint softmax, fused CE
vs the dense teacher, between-step shifts) — written from the spec, for tests
only.
"""

import numpy as np
import torch
import torch.nn.functional as F


def rope_tables(positions, dim, base=10000.0):
    inv_freq = 1.0 / (base ** (np.arange(0, dim, 2) / dim))
    t = torch.as_tensor(positions, dtype=torch.float32)
    freqs = torch.einsum("bs,j->bsj", t, torch.tensor(inv_freq, dtype=torch.float32))
    emb = torch.cat((freqs, freqs), dim=-1)
    return emb.cos(), emb.sin()


def rotate_half(x):
    half = x.shape[-1] // 2
    return torch.cat((-x[..., half:], x[..., :half]), dim=-1)


def apply_rope(q, k, cos, sin):
    cos, sin = cos[:, None], sin[:, None]
    return q * cos + rotate_half(q) * sin, k * cos + rotate_half(k) * sin


def rms_norm(x, weight, eps):
    var = x.pow(2).mean(-1, keepdim=True)
    return weight * (x * torch.rsqrt(var + eps))


class TorchEagle3Mirror:
    """Weights are plain tensors assigned by the test from the flax params."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.w = {}

    def _linear(self, name, x):
        return F.linear(x, self.w[name])

    def attention(self, hidden2h, cache_k, cache_v, bias, position_ids):
        cfg = self.cfg
        b, s, _ = hidden2h.shape
        d = cfg["head_dim"]
        h, kvh = cfg["heads"], cfg["kv_heads"]
        q = self._linear("q_proj", hidden2h).view(b, s, h, d).transpose(1, 2)
        k = self._linear("k_proj", hidden2h).view(b, s, kvh, d).transpose(1, 2)
        v = self._linear("v_proj", hidden2h).view(b, s, kvh, d).transpose(1, 2)
        lck = len(cache_k)
        cos, sin = rope_tables(position_ids + lck, d, cfg["rope_theta"])
        q, k = apply_rope(q, k, cos, sin)
        g = h // kvh
        k = k[:, :, None].expand(b, kvh, g, s, d).reshape(b, h, s, d)
        v = v[:, :, None].expand(b, kvh, g, s, d).reshape(b, h, s, d)
        cache_k = cache_k + [k]
        cache_v = cache_v + [v]

        k0, v0 = cache_k[0], cache_v[0]
        scale = 1.0 / np.sqrt(d)
        w = torch.matmul(q, k0.transpose(2, 3)) * scale + bias
        for ki in cache_k[1:]:
            wi = (q * ki).sum(-1) * scale
            w = torch.cat((w, wi[..., None]), dim=-1)
        p = F.softmax(w.float(), dim=-1)
        out = torch.matmul(p[..., :s], v0)
        for i, vi in enumerate(cache_v[1:]):
            out = out + p[..., s + i, None] * vi
        out = out.transpose(1, 2).reshape(b, s, h * d)
        return self._linear("o_proj", out), cache_k, cache_v

    def decoder_layer(self, input_emb, hidden, cache_k, cache_v, bias, pos):
        cfg = self.cfg
        residual = hidden
        nh = rms_norm(hidden, self.w["hidden_norm"], cfg["eps"])
        ne = rms_norm(input_emb, self.w["input_layernorm"], cfg["eps"])
        h2 = torch.cat((ne, nh), dim=-1)
        attn, cache_k, cache_v = self.attention(h2, cache_k, cache_v, bias, pos)
        hidden = residual + attn
        residual = hidden
        hidden = rms_norm(hidden, self.w["post_attention_layernorm"], cfg["eps"])
        gate = self._linear("gate_proj", hidden)
        up = self._linear("up_proj", hidden)
        hidden = self._linear("down_proj", F.silu(gate) * up)
        return residual + hidden, cache_k, cache_v

    def compute_logits(self, hidden):
        return self._linear("lm_head", rms_norm(hidden, self.w["norm"], self.cfg["eps"]))

    def teacher(self, target, loss_mask, length):
        t2d, d2t = self.w["t2d"], self.w["d2t"]
        tgt = target.float()
        token_ids = tgt.argmax(-1)
        position_mask = t2d[token_ids][..., None].int() * loss_mask
        draft_logits = tgt[..., t2d]
        target_p = F.softmax(draft_logits, dim=2)
        lse = torch.logsumexp(tgt, dim=-1, keepdim=True)
        p_on_draft = torch.exp(draft_logits - lse)
        vd = draft_logits.shape[-1]
        target_p = F.pad(target_p, (0, 0, 0, length), value=1.0 / vd)
        p_on_draft = F.pad(p_on_draft, (0, 0, 0, length), value=0.0)
        token_ids = F.pad(token_ids, (0, length), value=0)
        return target_p, p_on_draft, token_ids, position_mask

    def forward(self, input_ids, attention_mask, loss_mask, hidden_states,
                target, length):
        cfg = self.cfg
        b, s = input_ids.shape
        target_p_pad, p_on_draft_pad, token_ids_pad, position_mask = self.teacher(
            target, loss_mask, length
        )
        hidden = self._linear("fc", hidden_states)
        pos = np.arange(s)[None].repeat(b, 0)
        neg = -1e38
        row = np.arange(s)
        causal = np.where(row[None, :] <= row[:, None], 0.0, neg)
        bias = np.broadcast_to(causal, (b, 1, s, s)).copy()
        pad = np.asarray(attention_mask) == 0
        bias[pad[:, None, None, :].repeat(s, 2)] = neg
        bias = torch.tensor(bias, dtype=torch.float32)

        cache_k, cache_v = [], []
        cur_ids = input_ids
        cur_loss_mask = loss_mask.clone()
        cur_position_mask = position_mask.clone()
        outs = {k: [] for k in ("ploss", "acc", "acceptance", "correct", "denom")}
        for idx in range(length):
            tp = target_p_pad[:, idx: idx + s]
            pod = p_on_draft_pad[:, idx: idx + s]
            tids = token_ids_pad[:, idx: idx + s]
            emb = F.embedding(cur_ids, self.w["embed"])
            hidden, cache_k, cache_v = self.decoder_layer(
                emb, hidden, cache_k, cache_v, bias, pos
            )
            logits = self.compute_logits(hidden)

            pred_d = logits.argmax(-1)
            pred_t = pred_d + self.w["d2t"][pred_d]
            lm = cur_loss_mask[..., 0].float()
            correct = ((pred_t == tids).float() * lm).sum()
            denom = lm.sum().clamp_min(1e-6)
            outs["correct"].append(correct)
            outs["denom"].append(denom)
            outs["acc"].append(correct / denom)

            logp = F.log_softmax(logits.float(), dim=2)
            ploss = -torch.sum(cur_position_mask * tp * logp, 2).mean()
            outs["ploss"].append(ploss)

            draft_p = F.softmax(logits.float(), dim=-1)
            acc_tok = torch.minimum(pod, draft_p).sum(-1)
            m = cur_position_mask[..., 0].float()
            outs["acceptance"].append(
                (acc_tok * m).sum() / m.sum().clamp_min(1e-8)
            )

            if idx != length - 1:
                zero = torch.zeros_like(cur_ids[:, -1:])
                cur_ids = torch.cat((cur_ids[:, 1:], zero), dim=1)
                zm = torch.zeros_like(cur_position_mask[:, -1:])
                cur_position_mask = torch.cat(
                    (cur_position_mask[:, 1:], zm), dim=1
                )
                zl = torch.zeros_like(cur_loss_mask[:, -1:])
                cur_loss_mask = torch.cat((cur_loss_mask[:, 1:], zl), dim=1)
        return {k: torch.stack(v) for k, v in outs.items()}
