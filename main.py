#!/usr/bin/env python
"""Train / test the mesh VAE — CLI-compatible with the reference's main.py
(`python main.py -c files/default.cfg -t [-s] [-v]`,
/root/reference/main.py:327-342) with an extra `--cpu` escape hatch."""
import argparse
import os


def main():
    parser = argparse.ArgumentParser(
        description="TPU Mesh-VAE Trainer",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("-c", "--conf", help="path of config file")
    parser.add_argument("-t", "--train", action="store_true")
    parser.add_argument("-s", "--test", action="store_true")
    parser.add_argument("--cpu", action="store_true", help="force cpu")
    parser.add_argument("-v", "--vis", action="store_true",
                        help="save transformed meshes")
    parser.add_argument("-p", "--parameter", metavar=("parameter", "value"),
                        action="append", nargs=2, help="config overrides")
    args = parser.parse_args()

    if args.cpu:
        # The env var alone is ignored on this image (the axon sitecustomize
        # merges platforms); the config update is what actually forces CPU —
        # same as inference.py / crecon.py.
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    from meshvae_tpu.config import apply_overrides, read_config
    from meshvae_tpu.train.driver import run

    if args.conf is None:
        args.conf = os.path.join(os.path.dirname(__file__), "files",
                                 "default.cfg")
        print("configuration file not specified, trying to load "
              "it from current directory", args.conf)

    config = apply_overrides(read_config(args.conf), args.parameter)
    run(config, do_train=args.train, do_test=args.test, vis=args.vis)


if __name__ == "__main__":
    main()
