from unet_research_tpu.utils.general import create_dir, seed_everything, to_pil
