# Dev shell (reference ships flake.nix with python + ffmpeg + node —
# reference flake.nix:14-24). This build's TPU image bakes its own Python
# env, so the flake only matters for local non-TPU development; it is not
# exercisable in the zero-egress build image (no nix).
{
  description = "whisper-mlx-tpu dev shell";

  # Pinned to the nixos-25.05 release tag for reproducibility (the
  # reference commits a flake.lock; this build image has no nix binary and
  # no egress, so a generated lock — whose narHash must be computed from
  # the fetched tarball — cannot be produced honestly here. A branch-less
  # ref pin is the closest faithful equivalent: run `nix flake lock` once
  # on a networked machine to materialize flake.lock from it.)
  inputs.nixpkgs.url = "github:NixOS/nixpkgs/25.05";

  outputs = { self, nixpkgs }:
    let
      forAllSystems = f: nixpkgs.lib.genAttrs [ "x86_64-linux" "aarch64-linux" ]
        (system: f nixpkgs.legacyPackages.${system});
    in {
      devShells = forAllSystems (pkgs: {
        default = pkgs.mkShell {
          packages = with pkgs; [
            python312
            python312Packages.pip
            ffmpeg        # non-WAV container decode (audio/decode.py gate)
            gcc           # native lib (whisper_mlx_tpu/native)
            tesseract     # OCR tool backend
          ];
          shellHook = ''
            export PYTHONPATH=$PWD''${PYTHONPATH:+:$PYTHONPATH}
          '';
        };
      });
    };
}
