#!/usr/bin/env python
"""Analyse inference results — CLI parity with /root/reference/report.py:
`python report.py inference.json [-p] [-e]`.

Input schema (written by inference.py): {filename: {"sex": 0|1,
"reconstruction_error": {"max": float, "mean": float}}}. Ground-truth sex
comes from the filename's second `_`-separated token (f=0, m=1), the same
convention the dataset loader uses."""
import argparse
import json


def label_from_name(name: str) -> int:
    return 0 if name.split("_")[1] == "f" else 1


def prediction_report(data: dict) -> tuple[int, list[str]]:
    """Returns (n_wrong, lines describing each wrong prediction)."""
    n_wrong = 0
    lines = []
    for name, record in data.items():
        if label_from_name(name) == record["sex"]:
            continue
        n_wrong += 1
        err = record["reconstruction_error"]
        lines.append(f"{name}: wrong prediction")
        lines.append(f"reconstruction error : max= {err['max']}, "
                     f"mean= {err['mean']}")
    return n_wrong, lines


def main():
    parser = argparse.ArgumentParser(
        description="Analyse inference results",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("JSONFile", help="JSON inference results file")
    parser.add_argument("-p", help="Analyse sex prediction results",
                        action="store_true")
    parser.add_argument("-e", help="List max reconstruction errors",
                        action="store_true")
    args = parser.parse_args()

    with open(args.JSONFile, "r") as fp:
        data = json.load(fp)

    if args.p:
        n_wrong, lines = prediction_report(data)
        for line in lines:
            print(line)

    print(f"{len(data)} predictions")
    if args.p:
        accuracy = 100.0 * (len(data) - n_wrong) / len(data) if data else 0.0
        print(f"{n_wrong} wrong predictions. Accuracy : {accuracy:.2f}%")

    if args.e:
        print("Sorted max errors:")
        by_max_error = sorted(
            data.items(), key=lambda kv: kv[1]["reconstruction_error"]["max"])
        for name, record in by_max_error:
            print(f"{name} : {record['reconstruction_error']['max']}")


if __name__ == "__main__":
    main()
