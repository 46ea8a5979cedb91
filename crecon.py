#!/usr/bin/env python
"""Second-stage reconstruction-difference classifier CLI — compatible with
the reference's `python crecon.py -c files/crecon.cfg -t/-s [--cpu]`
(/root/reference/crecon.py:358-373)."""
import argparse
import os


def main():
    parser = argparse.ArgumentParser(description="TPU crecon Trainer")
    parser.add_argument("-c", "--conf", help="path of config file")
    parser.add_argument("-t", "--train", action="store_true")
    parser.add_argument("-s", "--test", action="store_true")
    parser.add_argument("--cpu", action="store_true", help="force cpu")
    parser.add_argument("-p", "--parameter", metavar=("parameter", "value"),
                        action="append", nargs=2, help="config overrides")
    args = parser.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from meshvae_tpu.config import apply_overrides, read_config
    from meshvae_tpu.train import crecon_driver

    if args.conf is None:
        args.conf = os.path.join(os.path.dirname(__file__), "files",
                                 "crecon.cfg")
        print("configuration file not specified, trying to load "
              "it from current directory", args.conf)

    config = apply_overrides(read_config(args.conf), args.parameter)
    crecon_driver.run(config, do_train=args.train, do_test=args.test)


if __name__ == "__main__":
    main()
