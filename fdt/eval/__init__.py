from fdt.eval.pr import calc_pr, TfConfAccumulator, gen_tp_fp, pr_curve, roc_curve

__all__ = ["calc_pr", "TfConfAccumulator", "gen_tp_fp", "pr_curve", "roc_curve"]
