"""Test harness: force an 8-virtual-device CPU platform so multi-chip
sharding paths compile and execute in CI without TPUs (SURVEY.md §4d)."""
import os

# Must run before any backend initialization. Note this image ships
# JAX_PLATFORMS=axon (a TPU plugin registered via sitecustomize) — a plain
# env setdefault is NOT enough; override the config explicitly.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from meshvae_tpu.mesh.io import TriMesh


def make_grid_mesh(n: int = 8, jitter: float = 0.0, seed: int = 0) -> TriMesh:
    """Triangulated n x n planar grid (with optional z jitter) — a cheap,
    deterministic stand-in for the hip-bone template in unit tests."""
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float64),
                         np.arange(n, dtype=np.float64))
    z = jitter * rng.standard_normal((n, n)) if jitter else np.zeros((n, n))
    v = np.stack([xs.ravel(), ys.ravel(), z.ravel()], axis=1)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            b = a + 1
            c = a + n
            d = c + 1
            faces.append((a, b, c))
            faces.append((b, d, c))
    return TriMesh(v, np.array(faces, dtype=np.int64))


@pytest.fixture
def grid_mesh():
    return make_grid_mesh(8, jitter=0.05)


TEMPLATE_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "template", "template5k.obj")


@pytest.fixture(scope="session")
def template_mesh():
    from meshvae_tpu.mesh.io import load_obj
    return load_obj(TEMPLATE_PATH)


@pytest.fixture(scope="session")
def trained_env(tmp_path_factory):
    """Train 2 folds for 2 epochs on a tiny synthetic setup; shared by the
    CLI-layer tests (inference, crecon, report, serve). Consumers must not
    mutate the returned config (dict(config) before overriding)."""
    from meshvae_tpu.config import default_config
    from meshvae_tpu.data.synthetic import generate_synthetic_dataset
    from meshvae_tpu.mesh.io import save_obj
    from meshvae_tpu.train.driver import run

    root = str(tmp_path_factory.mktemp("cli"))
    template = make_grid_mesh(8, jitter=0.05)
    template_path = os.path.join(root, "template.obj")
    save_obj(template_path, template.v, template.f)
    data_dir = os.path.join(root, "data")
    generate_synthetic_dataset(template, data_dir, n_samples=16, seed=1)

    config = default_config()
    config.update({
        "checkpoint_dir": os.path.join(root, "ckpt"),
        "template": template_path,
        "root_dir": data_dir,
        "log_file": os.path.join(root, "ckpt", "log.txt"),
        "folds": 2,
        "test_size": 0.25,
        "n_layers": 2,
        "num_hidden": 16,
        "num_style": 4,
        "downsampling_factors": [2, 2],
        "polygon_order": [3, 3, 3],
        "num_conv_filters": [8, 16, 16],
        "batch_size": 4,
        "epoch": 2,
        "hierarchy_cache_dir": os.path.join(root, "cache"),
    })
    run(config, do_train=True, do_test=False)
    return config, template, root
