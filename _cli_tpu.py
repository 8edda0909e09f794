"""Full CLI pipeline on the real TPU at 224px with vit_tiny."""
import tempfile, os, time
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.cli.main import main

d = tempfile.mkdtemp()
t0 = time.time()
main(["synth-data", "--output_dir", d+"/data", "--n_per_class", "6", "--image_size", "224"])
print(f"[{time.time()-t0:.0f}s] data done", flush=True)
main(["train", "--data_root", d+"/data", "--model", "vit_tiny",
      "--output_dir", d+"/t", "--epochs", "1", "--batch_size", "16"])
print(f"[{time.time()-t0:.0f}s] train done", flush=True)
ck = d+"/t/vit_tiny/all/vit_tiny_best_model_finetuned.safetensors"
main(["attack", "--data_root", d+"/data", "--model", "vit_tiny",
      "--model_path", ck, "--output_dir", d+"/adv",
      "--splits", "train", "test", "--steps", "10", "--batch_size", "16",
      "--fused_attention"])
print(f"[{time.time()-t0:.0f}s] attack done", flush=True)
main(["train-lora", "--data_root", d+"/data", "--model", "vit_tiny",
      "--model_path", ck, "--adv_root", d+"/adv", "--output_dir", d+"/loras",
      "--attacks", "pgd", "--ranks", "8", "--epochs", "1", "--batch_size", "16"])
print(f"[{time.time()-t0:.0f}s] train-lora done", flush=True)
main(["eval-compose", "--data_root", d+"/data", "--model", "vit_tiny",
      "--model_path", ck, "--adv_root", d+"/adv", "--lora_root", d+"/loras",
      "--attacks", "pgd", "--rank", "8", "--output_dir", d+"/eval",
      "--batch_size", "16"])
print(f"[{time.time()-t0:.0f}s] FULL TPU PIPELINE OK", flush=True)
