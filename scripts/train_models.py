"""Retrain every committed model artifact under models/ from the seed
corpora — deterministic, so re-running on an unchanged
``textpipe_ray.data.seed_corpora`` reproduces the committed files
byte-for-byte (same strategy as the reference's committed
``tests/models/gensim_test_{en,nl}.kv``).

Usage: ``python scripts/train_models.py [models_dir]``

If the seed corpora change, keep/drop labels can shift — regenerate the
synthetic pages fixtures afterwards (delete ``/tmp/pages_*`` /
``/tmp/textpipe_ray_pages``; see .claude/skills/verify gotchas).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(__file__).resolve().parents[1] / "models"
    out_dir.mkdir(parents=True, exist_ok=True)
    import json

    from textpipe_ray.data.seed_corpora import SEED_CORPORA
    from textpipe_ray.functions import langid, perplexity

    for name, module in (("langid.json", langid), ("lm.json", perplexity)):
        model = module.train(SEED_CORPORA)
        with open(out_dir / name, "w", encoding="utf8") as f:
            json.dump(model, f, ensure_ascii=False, sort_keys=True)
        print(f"wrote {out_dir / name}")
    from textpipe_ray.functions import quality_score

    model = quality_score.train()
    with open(out_dir / "quality_weights.json", "w", encoding="utf8") as f:
        json.dump(model, f, ensure_ascii=False, sort_keys=True, indent=1)
    print(f"wrote {out_dir / 'quality_weights.json'} (acc {model['train_accuracy']:.4f})")
    # thresholds / scrub rules are hand-versioned JSON, not trained —
    # they are validated (not regenerated) here
    repo_models = Path(__file__).resolve().parents[1] / "models"
    for name in ("quality_thresholds.json", "scrub_rules.json"):
        with open(repo_models / name, encoding="utf8") as f:
            json.load(f)
        print(f"validated {repo_models / name}")


if __name__ == "__main__":
    main()
