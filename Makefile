# convenience targets (the reference Makefile only wrapped qsub cleanup)

test:
	python -m pytest tests/ -x -q

test-tpu:
	UNET_TPU_TESTS=1 python -m pytest tests/test_pallas_dropblock.py -x -q

bench:
	python bench.py

matrix:
	python -m unet_research_tpu.cli.run_matrix -data_path augmented_data -out_root runs -stage all

clean:
	rm -rf _runs __pycache__ */__pycache__ .pytest_cache

.PHONY: test test-tpu bench matrix clean
