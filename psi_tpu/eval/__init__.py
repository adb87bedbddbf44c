from psi_tpu.eval.diversity import kmeans, diversity_metrics
from psi_tpu.eval.collision import collision_contact_scores

__all__ = ["kmeans", "diversity_metrics", "collision_contact_scores"]
