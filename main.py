"""Package entry stub (the reference ships an equivalent hello stub)."""


def main() -> None:
    print("p2igan-tpu: see scripts/train.py, scripts/infer.py, experiments/main.py")


if __name__ == "__main__":
    main()
