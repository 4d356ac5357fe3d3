"""Baseline 1: text -> gesture attention seq2seq.

Behavioral contract: reference scripts/model/seq2seq_net.py:14-254.

- EncoderRNN: pretrained word embedding -> bidirectional GRU over the
  SOS/EOS word sequence, directions summed.  The reference uses torch
  packed sequences (sorted batches); we use pad+mask with identical
  semantics: outputs at padded steps are exactly zero and the final
  hidden state of each direction is taken at each sequence's own length
  (see ``masked_gru_scan``).  This removes the sort-by-length collate
  requirement (SURVEY.md §7.2).
- Attn: additive (Bahdanau) scoring v . tanh(W [h; enc_t]) with softmax
  over all encoder steps (the reference does not mask attention; padded
  encoder outputs are zero vectors, reproduced here).
- Decoder: stepped one frame at a time.  The reference runs a Python
  loop (seq2seq_net.py:244-252); here the whole autoregressive decode is
  one ``nn.scan`` (XLA-compiled loop) with teacher forcing on the first
  n_pre_poses frames and BatchNorm statistics carried across steps.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.init import normal_init
from ..ops.layers import BatchNorm, TorchDense
from ..ops.recurrent import GRUCell
from ..ops.init import uniform_init


def masked_gru_scan(wi, bi, wh, bh, x, h0, mask, reverse=False):
    """gru_scan with packed-sequence semantics: steps with mask==0 leave
    the hidden state unchanged and emit zero outputs."""
    h_size = h0.shape[-1]
    xp = jnp.einsum("bti,gi->btg", x, wi) + bi
    xp = jnp.swapaxes(xp, 0, 1)                  # (T, B, 3H)
    m = jnp.swapaxes(mask, 0, 1)[..., None]      # (T, B, 1)

    def step(h, inp):
        xt, mt = inp
        hp = h @ wh.T + bh
        xr, xz, xn = (xt[..., :h_size], xt[..., h_size:2 * h_size],
                      xt[..., 2 * h_size:])
        hr, hz, hn = (hp[..., :h_size], hp[..., h_size:2 * h_size],
                      hp[..., 2 * h_size:])
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        h_new = jnp.where(mt > 0, h_new, h)
        y = jnp.where(mt > 0, h_new, jnp.zeros_like(h_new))
        return h_new, y

    h_last, ys = jax.lax.scan(step, h0, (xp, m), reverse=reverse)
    return jnp.swapaxes(ys, 0, 1), h_last


class EncoderRNN(nn.Module):
    """(B, Tw) word ids + lengths -> (outputs (B, Tw, H), h_n (2L, B, H))."""
    n_words: int
    embed_size: int
    hidden_size: int
    n_layers: int
    dropout: float

    @nn.compact
    def __call__(self, word_ids, lengths, train: bool = False):
        table = self.param("embedding", normal_init(1.0),
                           (self.n_words, self.embed_size))
        emb = jnp.take(table, word_ids, axis=0)
        t = word_ids.shape[1]
        mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(emb.dtype)

        h = self.hidden_size
        bound_init = uniform_init(float(h) ** -0.5)
        layer_in = emb
        h_finals = []
        for layer in range(self.n_layers):
            in_size = layer_in.shape[-1]
            outs = []
            for d in range(2):
                sfx = "l{}{}".format(layer, "_reverse" if d else "")
                wi = self.param("weight_ih_" + sfx, bound_init, (3 * h, in_size))
                wh = self.param("weight_hh_" + sfx, bound_init, (3 * h, h))
                bi = self.param("bias_ih_" + sfx, bound_init, (3 * h,))
                bh = self.param("bias_hh_" + sfx, bound_init, (3 * h,))
                out, h_fin = masked_gru_scan(
                    wi, bi, wh, bh, layer_in,
                    jnp.zeros((emb.shape[0], h), emb.dtype), mask,
                    reverse=bool(d))
                outs.append(out)
                h_finals.append(h_fin)
            layer_in = jnp.concatenate(outs, -1)
            if self.dropout > 0 and layer < self.n_layers - 1:
                layer_in = nn.Dropout(rate=self.dropout)(
                    layer_in, deterministic=not train)
        outputs = layer_in[:, :, :h] + layer_in[:, :, h:]
        return outputs, jnp.stack(h_finals)


class Attn(nn.Module):
    """Additive attention (reference seq2seq_net.py:59-89)."""
    hidden_size: int

    @nn.compact
    def __call__(self, hidden, encoder_outputs):
        """hidden (B, H); encoder_outputs (B, T, H) -> weights (B, 1, T)."""
        t = encoder_outputs.shape[1]
        h_rep = jnp.repeat(hidden[:, None, :], t, axis=1)
        energy = jnp.tanh(TorchDense(self.hidden_size, name="attn")(
            jnp.concatenate([h_rep, encoder_outputs], axis=2)))
        v = self.param("v", normal_init(float(self.hidden_size) ** -0.5),
                       (self.hidden_size,))
        scores = jnp.einsum("h,bth->bt", v, energy)
        return jax.nn.softmax(scores, axis=1)[:, None, :]


class _DecoderStep(nn.Module):
    """One frame of the Bahdanau attention decoder
    (reference seq2seq_net.py:92-187), scanned over time by Seq2SeqNet."""
    hidden_size: int
    output_size: int
    n_layers: int
    dropout_p: float
    train: bool = False

    @nn.compact
    def __call__(self, carry, xs):
        prev_out, hidden, encoder_outputs = carry
        teacher, use_teacher = xs
        motion_input = jnp.where(use_teacher, teacher, prev_out)

        attn_weights = Attn(self.hidden_size)(hidden[-1], encoder_outputs)
        context = jnp.einsum("bot,bth->boh", attn_weights,
                             encoder_outputs)[:, 0, :]

        rnn_in = jnp.concatenate([motion_input, context], axis=1)
        rnn_in = TorchDense(self.hidden_size, name="pre_linear")(rnn_in)
        rnn_in = BatchNorm()(rnn_in, use_running_average=not self.train)
        rnn_in = nn.relu(rnn_in)

        out, new_hidden = GRUCell(hidden_size=self.hidden_size,
                                  num_layers=self.n_layers,
                                  dropout=self.dropout_p)(
                                      rnn_in, hidden,
                                      deterministic=not self.train)
        out = TorchDense(self.output_size, name="out")(out)
        return (out, new_hidden, encoder_outputs), out


class Seq2SeqNet(nn.Module):
    """Full text->gesture network (reference seq2seq_net.py:217-254).

    The per-frame Python decode loop of the reference is replaced by one
    nn.scan over the n_frames-1 generated steps; BatchNorm batch_stats
    are carried through the scan (so train-mode stats update every step,
    like the reference).  GAN_noise_size is effectively 0 in all published
    configs (the z input is always None in reference train/synthesis
    paths) and is not modeled.
    """
    pose_dim: int
    n_frames: int
    n_pre_poses: int
    n_words: int
    word_embed_size: int
    hidden_size: int
    n_layers: int
    dropout_prob: float

    @nn.compact
    def __call__(self, in_text, text_lengths, poses, vid_indices=None,
                 train: bool = False):
        enc_out, enc_hidden = EncoderRNN(
            self.n_words, self.word_embed_size, self.hidden_size,
            self.n_layers, self.dropout_prob)(in_text, text_lengths,
                                              train=train)
        # layer-0 fwd/bwd hidden states seed the decoder
        # (reference seq2seq_net.py:238: encoder_hidden[:n_layers])
        dec_hidden = enc_hidden[:self.n_layers]

        n_steps = self.n_frames - 1
        teacher = jnp.swapaxes(poses[:, :n_steps, :], 0, 1)  # inputs t-1
        step_idx = jnp.arange(n_steps)
        use_teacher = (step_idx < self.n_pre_poses)[:, None, None]
        use_teacher = jnp.broadcast_to(
            use_teacher, (n_steps, poses.shape[0], 1)).astype(bool)

        carry0 = (poses[:, 0], dec_hidden, enc_out)
        step_kwargs = dict(hidden_size=self.hidden_size,
                           output_size=self.pose_dim,
                           n_layers=self.n_layers,
                           dropout_p=self.dropout_prob, train=train)
        if self.is_initializing():
            # one unscanned step creates params AND batch_stats so the
            # scanned apply path can carry batch_stats across steps
            _, out = _DecoderStep(**step_kwargs, name="decoder")(
                carry0, (teacher[0], use_teacher[0]))
            outs = jnp.broadcast_to(out[None], (n_steps,) + out.shape)
        else:
            if train:
                # BN updates its running stats every step (torch parity)
                var_kwargs = dict(variable_broadcast="params",
                                  variable_carry="batch_stats")
            else:
                var_kwargs = dict(
                    variable_broadcast=["params", "batch_stats"])
            scan = nn.scan(
                _DecoderStep,
                split_rngs={"params": False, "dropout": True},
                in_axes=0, out_axes=0, **var_kwargs)
            _, outs = scan(**step_kwargs, name="decoder")(
                carry0, (teacher, use_teacher))

        outs = jnp.swapaxes(outs, 0, 1)  # (B, n_frames-1, pose_dim)
        return jnp.concatenate([poses[:, :1], outs], axis=1)
