#!/usr/bin/env python
"""Plot training history curves — CLI parity with
/root/reference/plotLosses.py: `python plotLosses.py history1.json
[-d] [-o out.png] [-c config.cfg]`."""
import argparse
import json
import math


def format_timespan(seconds: float) -> str:
    seconds = int(seconds)
    parts = []
    for unit, width in (("hour", 3600), ("minute", 60), ("second", 1)):
        value, seconds = divmod(seconds, width)
        if value:
            parts.append(f"{value} {unit}{'s' if value != 1 else ''}")
    return ", ".join(parts) if parts else "0 seconds"


def main():
    parser = argparse.ArgumentParser(
        description="Plot training history",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("JSONFile", help="JSON training history file")
    parser.add_argument("-d", "--display", help="Display plot on screen",
                        action="store_true")
    parser.add_argument("-o", "--output", help="output file")
    parser.add_argument("-c", "--config", help="model and training config file")
    args = parser.parse_args()

    import matplotlib
    if not args.display:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(args.JSONFile, "r") as fp:
        data = json.load(fp)
    types = ["training", "validation"]
    loss_types = list(data[0][types[1]].keys())
    epochs = [e["epoch"] for e in data]

    figure = plt.figure(figsize=(18, 10))
    figure.suptitle(args.JSONFile, fontsize=16)

    width = 3
    pos = width * 100 + width * 10
    for loss in loss_types:
        pos += 1
        loss_txt = " ".join(loss.split("_"))
        ax = figure.add_subplot(pos)
        ax.set_xlabel("epoch")
        ax.set_ylabel(loss_txt)
        ax.set_xlim(0, epochs[-1])
        for typ in types:
            if loss not in data[0][typ]:
                continue
            ax.plot(epochs, [e[typ][loss] for e in data], label=typ)
        ax.legend(title=loss_txt, loc="center right")

    duration = (data[-1]["begin"] - data[0]["begin"] + data[-1]["duration"])
    text = "Total training time : " + format_timespan(math.ceil(duration))
    if args.config:
        from meshvae_tpu.config import read_config
        text += "\nConfig : " + json.dumps(
            {k: v for k, v in read_config(args.config).items()
             if not isinstance(v, (list, dict))})
    figure.text(0.1, 0.15, text, wrap=True)

    if args.display:
        plt.show()
    if args.output:
        plt.savefig(args.output)


if __name__ == "__main__":
    main()
