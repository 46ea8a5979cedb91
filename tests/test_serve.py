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
def server_parts(trained_env):
    """Model/ops/params/norm built once for every server variant below."""
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
    return (model, ops, ck["params"], norm["mean"].astype(np.float32),
            norm["std"].astype(np.float32), tmpl)


@pytest.fixture(scope="module")
def server_env(trained_env, server_parts):
    from meshvae_tpu.infer.serve import MeshServer

    config, template, root = trained_env
    model, ops, params, mean, std, tmpl = server_parts
    out_dir = os.path.join(root, "serve_out")
    server = MeshServer(
        model, ops, params, mean, std, template=np.asarray(tmpl.v),
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


class TestWireDtypeAndArtifact:
    def test_f16_wire_bounded_against_f32(self, trained_env, server_parts):
        """The default f16 chunk upload (serve_wire_dtype) must agree with
        an f32-wire server: identical sex predictions, reconstruction
        errors within the f16 quantization bound (x is normalized ~N(0,1),
        so the wire rounding is ~5e-4 relative on the inputs)."""
        from meshvae_tpu.infer.serve import MeshServer

        config, template, root = trained_env
        model, ops, params, mean, std, tmpl = server_parts
        files = [os.path.join(config["root_dir"], f)
                 for f in sorted(os.listdir(config["root_dir"]))
                 if f.endswith(".obj")][:4]

        def build(wire):
            return MeshServer(
                model, ops, params, mean, std, template=np.asarray(tmpl.v),
                faces=np.asarray(tmpl.f), batch_size=4,
                output_path=os.path.join(root, f"serve_{wire}"),
                save_meshes=False, wire_dtype=np.dtype(wire))

        res16 = build("float16").handle(files)
        res32 = build("float32").handle(files)
        for a, b in zip(res16, res32):
            assert a["sex"] == b["sex"]
            np.testing.assert_allclose(
                a["reconstruction_error"]["mean"],
                b["reconstruction_error"]["mean"], rtol=5e-3)
            np.testing.assert_allclose(
                a["reconstruction_error"]["max"],
                b["reconstruction_error"]["max"], rtol=5e-3)

    def test_artifact_server_matches_engine_server(self, trained_env,
                                                   server_parts, tmp_path):
        """export_packed_serving_step -> load_serving_step -> a MeshServer
        with NO model/ops/params must answer identically to the warm
        engine server (same f16 wire, same math)."""
        from meshvae_tpu.infer.export import (export_packed_serving_step,
                                              load_serving_step)
        from meshvae_tpu.infer.serve import MeshServer

        config, template, root = trained_env
        model, ops, params, mean, std, tmpl = server_parts
        files = [os.path.join(config["root_dir"], f)
                 for f in sorted(os.listdir(config["root_dir"]))
                 if f.endswith(".obj")][:5]  # 2 chunks at bs 4 (padding)

        data = export_packed_serving_step(
            model, ops, params, mean, std, batch_size=4,
            num_vertices=np.asarray(tmpl.v).shape[0], collect_meshes=True)
        art = tmp_path / "serve.jaxexport"
        art.write_bytes(data)

        engine_server = MeshServer(
            model, ops, params, mean, std, template=np.asarray(tmpl.v),
            faces=np.asarray(tmpl.f), batch_size=4,
            output_path=os.path.join(root, "serve_eng"), save_meshes=True)
        art_server = MeshServer(
            None, None, None, mean, std, template=np.asarray(tmpl.v),
            faces=np.asarray(tmpl.f), batch_size=4,
            output_path=os.path.join(root, "serve_art"), save_meshes=True,
            serving_step=load_serving_step(str(art)))
        assert art_server.warmup() >= 0.0

        res_a = art_server.handle(files)
        res_e = engine_server.handle(files)
        for a, b in zip(res_a, res_e):
            assert a["file"] == b["file"] and a["sex"] == b["sex"]
            np.testing.assert_allclose(
                a["reconstruction_error"]["mean"],
                b["reconstruction_error"]["mean"], rtol=1e-5)
            # mesh triples written from the artifact outputs too
            assert os.path.exists(a["recon"]) and os.path.exists(a["oppo"])

    def test_artifact_without_meshes_rejects_save_meshes(
            self, trained_env, server_parts, tmp_path):
        from meshvae_tpu.infer.export import (export_packed_serving_step,
                                              load_serving_step)
        from meshvae_tpu.infer.serve import MeshServer

        config, template, root = trained_env
        model, ops, params, mean, std, tmpl = server_parts
        data = export_packed_serving_step(
            model, ops, params, mean, std, batch_size=4,
            num_vertices=np.asarray(tmpl.v).shape[0], collect_meshes=False)
        srv = MeshServer(
            None, None, None, mean, std, template=np.asarray(tmpl.v),
            faces=np.asarray(tmpl.f), batch_size=4,
            output_path=str(tmp_path), save_meshes=True,
            serving_step=load_serving_step(data))
        with pytest.raises(RuntimeError, match="without mesh outputs"):
            srv.warmup()


def _write_serve_cfg(config, cfg_path):
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


class TestServeCLI:
    def test_cli_serve_roundtrip(self, trained_env, tmp_path):
        """The real `inference.py --serve` process: ready line, one request,
        JSON answers, clean EOF shutdown."""
        config, template, root = trained_env
        cfg_path = os.path.join(tmp_path, "serve.cfg")
        _write_serve_cfg(config, cfg_path)

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

    def test_cli_export_serve_then_artifact_serve(self, trained_env,
                                                  tmp_path):
        """The AOT cold-start path end to end: `--export-serve` writes the
        artifact, then a FRESH `--serve --artifact` process answers without
        ever building the model (hierarchy/operators/checkpoint/trace all
        skipped) and matches a normal serve process's answers."""
        config, template, root = trained_env
        cfg_path = os.path.join(tmp_path, "serve.cfg")
        _write_serve_cfg(config, cfg_path)
        art = os.path.join(tmp_path, "serve.jaxexport")

        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "inference.py"),
             "-c", cfg_path, "--export-serve", art, "--no-meshes", "--cpu"],
            capture_output=True, text=True, timeout=600, cwd=REPO)
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert os.path.exists(art)

        mesh_file = os.path.join(config["root_dir"],
                                 sorted(os.listdir(config["root_dir"]))[0])

        def serve(extra):
            p = subprocess.run(
                [sys.executable, os.path.join(REPO, "inference.py"),
                 "-c", cfg_path, "-o", os.path.join(tmp_path, "out"),
                 "--serve", "--no-meshes", "--cpu"] + extra,
                input=mesh_file + "\n", capture_output=True, text=True,
                timeout=600, cwd=REPO)
            assert p.returncode == 0, p.stderr[-2000:]
            return [json.loads(l) for l in p.stdout.splitlines()
                    if l.startswith("{")]

        art_lines = serve(["--artifact", art])
        ref_lines = serve([])
        assert art_lines[0]["ready"] is True
        assert art_lines[0]["artifact"] == art
        [a] = [l for l in art_lines if "file" in l]
        [b] = [l for l in ref_lines if "file" in l]
        assert a["sex"] == b["sex"]
        np.testing.assert_allclose(a["reconstruction_error"]["mean"],
                                   b["reconstruction_error"]["mean"],
                                   rtol=1e-5)
