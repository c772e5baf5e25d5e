// STUB spoa.hpp — minimal stand-in for the SPOA library so the
// reference's haslr_assemble can be compiled OFFLINE (its build
// git-clones SPOA, impossible here).  Only the graph stages BEFORE
// consensus (compact_uniq.txt, backbone.*.gfa/stat) are compared
// against haslr_tpu; consensus output from this stub is meaningless
// (it returns the first added sequence).
#pragma once
#include <cstdint>
#include <memory>
#include <string>
#include <utility>
#include <vector>

namespace spoa {

using Alignment = std::vector<std::pair<int32_t, int32_t>>;

enum class AlignmentType { kSW = 0, kNW = 1, kOV = 2 };

class Graph;

class AlignmentEngine {
public:
    AlignmentEngine(AlignmentType, int8_t, int8_t, int8_t) {}
    Alignment align_sequence_with_graph(const std::string&,
                                        const std::unique_ptr<Graph>&) {
        return Alignment();
    }
};

class Graph {
public:
    void add_alignment(const Alignment&, const std::string& seq) {
        if (first_.empty()) first_ = seq;
    }
    std::string generate_consensus() { return first_; }

private:
    std::string first_;
};

inline std::unique_ptr<AlignmentEngine> createAlignmentEngine(
    AlignmentType t, int8_t m, int8_t n, int8_t g) {
    return std::unique_ptr<AlignmentEngine>(new AlignmentEngine(t, m, n, g));
}

inline std::unique_ptr<Graph> createGraph() {
    return std::unique_ptr<Graph>(new Graph());
}

}  // namespace spoa
