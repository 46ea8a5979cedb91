"""Warm-engine serving loop (inference.py --serve / infer/serve.py):
MeshServer request handling, padding/chunking, mesh writes, and the
line-oriented CLI protocol end to end."""
import io
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def server_env(trained_env):
    from meshvae_tpu.infer.serve import MeshServer
    from meshvae_tpu.train.checkpoint import (checkpoint_path,
                                              load_checkpoint)
    from meshvae_tpu.train.driver import build_model_and_ops, make_trainer

    config, template, root = trained_env
    model, ops, hier, tmpl = build_model_and_ops(config)
    trainer = make_trainer(config, model, ops)
    target = trainer.init_params(jax.random.key(0))
    ck = load_checkpoint(checkpoint_path(config["checkpoint_dir"], 1),
                         target, trainer.init_opt_state(target))
    norm = np.load(os.path.join(config["checkpoint_dir"], "norm.npz"))
    out_dir = os.path.join(root, "serve_out")
    server = MeshServer(
        model, ops, ck["params"], norm["mean"].astype(np.float32),
        norm["std"].astype(np.float32), template=np.asarray(tmpl.v),
        faces=np.asarray(tmpl.f), batch_size=4, output_path=out_dir,
        save_meshes=True)
    return server, config, root


class TestMeshServer:
    def test_single_mesh_request(self, server_env):
        server, config, root = server_env
        path = os.path.join(config["root_dir"],
                            sorted(os.listdir(config["root_dir"]))[0])
        assert path.endswith(".obj")
        [res] = server.handle([path])
        assert res["sex"] in (0, 1)
        err = res["reconstruction_error"]
        assert err["max"] >= err["mean"] >= 0 and np.isfinite(err["mean"])
        # recon/gt/oppo triple written under sex_change/
        assert os.path.exists(res["recon"]) and os.path.exists(res["oppo"])
        stem = os.path.basename(path).rsplit(".", 1)[0]
        assert os.path.exists(os.path.join(server.mesh_dir,
                                           stem + "_gt.obj"))

    def test_padding_and_chunking_match_full_batch(self, server_env):
        """3 meshes (pad to bs=4) and 6 meshes (two chunks) must score each
        mesh identically to a lone request — padding rows never leak."""
        server, config, root = server_env
        files = [os.path.join(config["root_dir"], f)
                 for f in sorted(os.listdir(config["root_dir"]))
                 if f.endswith(".obj")]
        lone = {os.path.basename(p): server.handle([p])[0] for p in files[:6]}
        for group in (files[:3], files[:6]):
            for res in server.handle(group):
                ref = lone[res["file"]]
                assert res["sex"] == ref["sex"]
                np.testing.assert_allclose(
                    res["reconstruction_error"]["mean"],
                    ref["reconstruction_error"]["mean"], rtol=1e-5)

    def test_serve_forever_protocol(self, server_env):
        """Directory request + bad request + blank line over the stdio
        protocol; the server keeps serving after an error."""
        server, config, root = server_env
        fin = io.StringIO(f"\n/nonexistent/mesh.obj\n{config['root_dir']}\n")
        fout = io.StringIO()
        server.serve_forever(fin, fout)
        lines = [json.loads(l) for l in fout.getvalue().splitlines()]
        assert "error" in lines[0]
        n = len([f for f in os.listdir(config["root_dir"])
                 if f.endswith(".obj")])
        results = [l for l in lines[1:] if "file" in l]
        done = [l for l in lines[1:] if "done" in l]
        assert len(results) == n and done == [
            {"done": n, "sec": done[0]["sec"]}]

    def test_vertex_count_mismatch_is_reported(self, server_env, tmp_path):
        from meshvae_tpu.mesh.io import save_obj
        server, config, root = server_env
        bad = os.path.join(tmp_path, "bad.obj")
        save_obj(bad, np.zeros((5, 3), np.float32),
                 np.array([[0, 1, 2]], np.int32))
        fin = io.StringIO(bad + "\n")
        fout = io.StringIO()
        server.serve_forever(fin, fout)
        [line] = [json.loads(l) for l in fout.getvalue().splitlines()]
        assert "error" in line and "vertices" in line["error"]


class TestServeCLI:
    def test_cli_serve_roundtrip(self, trained_env, tmp_path):
        """The real `inference.py --serve` process: ready line, one request,
        JSON answers, clean EOF shutdown."""
        config, template, root = trained_env
        cfg_path = os.path.join(tmp_path, "serve.cfg")
        ckpt_rel = os.path.relpath(config["checkpoint_dir"],
                                   os.path.dirname(cfg_path))
        keys = ("template", "folds", "test_size", "n_layers", "num_hidden",
                "num_style", "downsampling_factors", "polygon_order",
                "num_conv_filters", "batch_size", "hierarchy_cache_dir")
        def fmt(v):  # cfg lists are comma-separated, not python reprs
            return ", ".join(map(str, v)) if isinstance(v, list) else str(v)

        lines = ["[Input Output]", f"checkpoint_dir = {ckpt_rel}"]
        lines += [f"{k} = {fmt(config[k])}" for k in keys]
        with open(cfg_path, "w") as fp:
            fp.write("\n".join(lines) + "\n")

        mesh_file = os.path.join(config["root_dir"],
                                 sorted(os.listdir(config["root_dir"]))[0])
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "inference.py"),
             "-c", cfg_path, "-d", config["root_dir"],
             "-o", os.path.join(tmp_path, "out"),
             "--serve", "--no-meshes", "--cpu"],
            input=mesh_file + "\n", capture_output=True, text=True,
            timeout=600, cwd=REPO)
        assert proc.returncode == 0, proc.stderr[-2000:]
        out_lines = [json.loads(l) for l in proc.stdout.splitlines()
                     if l.startswith("{")]
        assert out_lines[0]["ready"] is True
        res = [l for l in out_lines if "file" in l]
        assert len(res) == 1 and res[0]["sex"] in (0, 1)
        assert [l for l in out_lines if "done" in l]
