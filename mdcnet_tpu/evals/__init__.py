from mdcnet_tpu.evals.bleu import calculate_bleu_scores, sentence_bleu
from mdcnet_tpu.evals.map import MeanAveragePrecision, map_at_03
from mdcnet_tpu.evals.meters import AvgMeter

__all__ = ["calculate_bleu_scores", "sentence_bleu", "MeanAveragePrecision",
           "map_at_03", "AvgMeter"]
