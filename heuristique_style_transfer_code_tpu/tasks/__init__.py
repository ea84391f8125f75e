from .style_transfer import (
    make_style_transfer_optimizer,
    style_transfer_gram_attention,
    style_transfer_patches,
)
from .embeddings import compute_embeddings_with_paths
from .classification import run_classification_test, plot_and_save_confusion_matrix
from .tsne import perform_tsne, plot_tsne_interactive
from .clustering import run_clustering
from .gradcam import gradcam_moco, generate_heatmap_overlays
from .camera import run_camera, make_camera_infer_fn, list_available_cameras
from .serving import BatchingInferenceServer
from .serving_http import make_http_server, serve_http
