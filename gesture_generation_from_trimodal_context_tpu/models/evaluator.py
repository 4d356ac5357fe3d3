"""Fréchet Gesture Distance (FGD) evaluator.

Behavioral contract: reference scripts/model/embedding_space_evaluator.py:15-156.
Loads the trained pose-autoencoder checkpoint, embeds real and generated
pose windows into the 32-d latent space (jitted, eval-mode BN), and
computes the Fréchet distance between the two latent distributions
(pytorch-fid sqrtm math with the eps fallback) plus the per-sample latent
MAE and reconstruction-error difference.
"""

import logging

import numpy as np
from scipy import linalg

import jax
import jax.numpy as jnp

from ..train.checkpoint import load_checkpoint_and_model


class EmbeddingSpaceEvaluator:
    def __init__(self, args, embed_net_path, lang_model=None):
        self.n_pre_poses = args.n_pre_poses
        (self.net_args, bundle, self.net_vars, _, _, self.pose_dim) = \
            load_checkpoint_and_model(embed_net_path, jax.random.PRNGKey(0))
        net = bundle.generator

        @jax.jit
        def embed(variables, poses, mask=None):
            out = net.apply(variables, None, None, None, poses, "pose",
                            train=False)
            feat, recon = out[3], out[6]
            err = jnp.abs(poses - recon)
            if mask is None:
                recon_err = jnp.mean(err)
            else:
                # masked batch (--eval_full_set padded tail on a
                # multi-device mesh): weight per-sample errors by mask
                per = jnp.mean(err, axis=tuple(range(1, err.ndim)))
                recon_err = jnp.sum(per * mask) / \
                    jnp.maximum(jnp.sum(mask), 1.0)
            return feat, recon_err

        self._embed = embed
        self.reset()

    def reset(self):
        self.context_feat_list = []
        self.real_feat_list = []
        self.generated_feat_list = []
        self.recon_err_diff = []
        self.mask_list = []

    def get_no_of_samples(self):
        return len(self.real_feat_list)

    def push_samples(self, context_text, context_spec, generated_poses,
                     real_poses, mask=None):
        """Embed one batch.  Results stay ON DEVICE — no host sync here;
        the sync happens once per eval pass in _materialize() (the
        reference syncs per batch, train.py:288-290).  ``mask`` (host
        float (B,), 1.0 = real row) marks --eval_full_set's padded tail
        rows; they are dropped from the feature lists at materialize
        time and weighted out of the recon error in-graph."""
        real_feat, recon_real = self._embed(self.net_vars, real_poses, mask)
        gen_feat, recon_fake = self._embed(self.net_vars, generated_poses,
                                           mask)
        self.real_feat_list.append(real_feat)
        self.generated_feat_list.append(gen_feat)
        self.recon_err_diff.append((recon_fake, recon_real))
        self.mask_list.append(mask)

    def push_feature_stack(self, gen_feats, real_feats, recon_fake,
                           recon_real, mask=None):
        """Accumulate a whole fused eval pass at once
        (train/eval_steps.make_fused_eval_pass): (K, B, F) feature
        stacks, (K,) per-batch masked recon errors, optional (K, B)
        mask.  Stays on device until _materialize."""
        feat_dim = gen_feats.shape[-1]
        self.generated_feat_list.append(gen_feats.reshape(-1, feat_dim))
        self.real_feat_list.append(real_feats.reshape(-1, feat_dim))
        self.mask_list.append(None if mask is None
                              else np.asarray(mask).reshape(-1))
        self.recon_err_diff.append((jnp.mean(recon_fake),
                                    jnp.mean(recon_real)))

    def _materialize(self):
        """One device->host transfer for everything accumulated
        (idempotent)."""
        self.real_feat_list, self.generated_feat_list, diffs = \
            jax.device_get((self.real_feat_list, self.generated_feat_list,
                            self.recon_err_diff))
        if any(m is not None for m in self.mask_list):
            keep = [None if m is None else np.asarray(m) > 0.5
                    for m in self.mask_list]
            self.real_feat_list = [
                f if k is None else f[k]
                for f, k in zip(self.real_feat_list, keep)]
            self.generated_feat_list = [
                f if k is None else f[k]
                for f, k in zip(self.generated_feat_list, keep)]
        self.mask_list = [None] * len(self.mask_list)
        self.recon_err_diff = [
            float(d[0]) - float(d[1]) if isinstance(d, tuple) else d
            for d in diffs]

    def get_features_for_viz(self):
        """2-D projection of real vs generated latents
        (reference embedding_space_evaluator.py:63-72).  Uses UMAP when
        importable, else a PCA fallback."""
        self._materialize()
        generated_feats = np.vstack(self.generated_feat_list)
        real_feats = np.vstack(self.real_feat_list)
        both = np.vstack((generated_feats, real_feats))
        try:
            import umap
            transformed = umap.UMAP().fit_transform(both)
        except ImportError:
            centered = both - both.mean(axis=0)
            _, _, vt = np.linalg.svd(centered, full_matrices=False)
            transformed = centered @ vt[:2].T
        n = transformed.shape[0] // 2
        return transformed[n:], transformed[:n]  # (real, generated)

    def get_scores(self):
        self._materialize()
        generated_feats = np.vstack(self.generated_feat_list)
        real_feats = np.vstack(self.real_feat_list)

        def frechet_distance(samples_a, samples_b):
            a_mu = np.mean(samples_a, axis=0)
            a_sigma = np.cov(samples_a, rowvar=False)
            b_mu = np.mean(samples_b, axis=0)
            b_sigma = np.cov(samples_b, rowvar=False)
            try:
                return calculate_frechet_distance(a_mu, a_sigma, b_mu,
                                                  b_sigma)
            except ValueError:
                return 1e10

        frechet_dist = frechet_distance(generated_feats, real_feats)
        feat_dist = float(np.mean(np.sum(
            np.abs(real_feats - generated_feats), axis=1)))
        return frechet_dist, feat_dist

    def get_diversity(self, cap=512):
        """Feature-space diversity: mean pairwise L2 distance among the
        accumulated latents, (generated, real).

        Complementary quality axis to FGD (VERDICT r4 item 5): FGD can
        saturate while the generator's OUTPUT VARIETY collapses toward
        the mean pose — mode collapse moves this number long before it
        moves a saturated FGD.  The reference evaluator has no such
        metric (embedding_space_evaluator.py:74-101); the definition is
        the standard gesture/dance-paper "Diversity" (mean pairwise
        feature distance, computed on a deterministic <=cap subsample to
        bound the O(n^2) pair matrix)."""
        self._materialize()

        def _div(feats):
            feats = np.vstack(feats)
            if feats.shape[0] > cap:
                idx = np.random.RandomState(0).choice(
                    feats.shape[0], cap, replace=False)
                feats = feats[idx]
            if feats.shape[0] < 2:
                return 0.0
            sq = np.sum(feats * feats, axis=1)
            d2 = np.maximum(sq[:, None] + sq[None, :]
                            - 2.0 * feats @ feats.T, 0.0)
            n = feats.shape[0]
            iu = np.triu_indices(n, k=1)
            return float(np.mean(np.sqrt(d2[iu])))

        return _div(self.generated_feat_list), _div(self.real_feat_list)


def _sqrtm(mat):
    """Matrix square root tolerant of scipy's disp-argument removal."""
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        try:
            result = linalg.sqrtm(mat, disp=False)
        except TypeError:  # scipy >= 1.18 dropped disp
            result = linalg.sqrtm(mat)
    return result[0] if isinstance(result, tuple) else result


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """d^2 = ||mu1 - mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)) — the stable
    pytorch-fid formulation used by the reference
    (embedding_space_evaluator.py:103-156)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape
    assert sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean = _sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        logging.warning("fid calculation produces singular product; "
                        "adding %s to diagonal of cov estimates", eps)
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset).dot(sigma2 + offset))

    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError("Imaginary component {}".format(m))
        covmean = covmean.real

    return (diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
            - 2 * np.trace(covmean))
