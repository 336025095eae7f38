// Golden-vector oracle harness.
//
// Compiles the *reference* kernels (from /root/reference, via include path —
// no sources are copied into this repo) and drives them over test vectors so
// the TPU rebuild can assert parity.  Modes:
//
//   tables  <out_dir>    — dump Context<float>/<double> tables as raw binary
//   sw                   — stdin lines: "target query match mismatch open ext strategy"
//                          stdout: "scalar_cigar scalar_offset avx_cigar avx_offset"
//   pairhmm              — stdin lines: "hap read q,... i,... d,... c,..."
//                          stdout: "%a-hex scalarf scalard avxf avxd" scores
//
// FTZ is enabled as the reference JNI init does
// (com_microsoft_mgl_pairhmm_MicrosoftPairHmm.cc:57).

#include <cstdio>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <sstream>
#include <iostream>

#include <x86intrin.h>

#include "sw_scalar.h"
#include "sw_avx.h"
#include "pairhmm_common.h"
#include "compute_prob_scalar.h"
#include "compute_prob_avx.h"

float compute_fast_prob_float(readinfo &read, std::vector<hapinfo> &hap_array);

using namespace std;

static vector<char> parse_quals(const string& csv) {
    vector<char> out;
    stringstream ss(csv);
    string tok;
    while (getline(ss, tok, ',')) out.push_back((char)stoi(tok));
    return out;
}

static int run_tables(const char* dir) {
    Context<float> cf;
    Context<double> cd;
    string base(dir);
    {
        FILE* f = fopen((base + "/ctx_f32.bin").c_str(), "wb");
        fwrite(cf.ph2pr, sizeof(float), 128, f);
        fwrite(cf.matchToMatchProb, sizeof(float), ((MAX_QUAL + 1) * (MAX_QUAL + 2)) >> 1, f);
        fwrite(cf.jacobianLogTable, sizeof(float), JACOBIAN_LOG_TABLE_SIZE, f);
        float ic = cf.INITIAL_CONSTANT, lic = cf.LOG10_INITIAL_CONSTANT;
        fwrite(&ic, sizeof(float), 1, f);
        fwrite(&lic, sizeof(float), 1, f);
        fclose(f);
    }
    {
        FILE* f = fopen((base + "/ctx_f64.bin").c_str(), "wb");
        fwrite(cd.ph2pr, sizeof(double), 128, f);
        fwrite(cd.matchToMatchProb, sizeof(double), ((MAX_QUAL + 1) * (MAX_QUAL + 2)) >> 1, f);
        fwrite(cd.jacobianLogTable, sizeof(double), JACOBIAN_LOG_TABLE_SIZE, f);
        double ic = cd.INITIAL_CONSTANT, lic = cd.LOG10_INITIAL_CONSTANT;
        fwrite(&ic, sizeof(double), 1, f);
        fwrite(&lic, sizeof(double), 1, f);
        fclose(f);
    }
    fprintf(stderr, "tables written to %s\n", dir);
    return 0;
}

static int run_sw() {
    string line;
    while (getline(cin, line)) {
        if (line.empty()) continue;
        stringstream ss(line);
        string target, query;
        int match, mismatch, open_, ext, strategy;
        ss >> target >> query >> match >> mismatch >> open_ >> ext >> strategy;

        swParameters p;
        p.sc_match = match > 0 ? match : -match;
        p.sc_mismatch = mismatch < 0 ? mismatch : -mismatch;
        p.g_open = open_ > 0 ? open_ : -open_;
        p.g_ext = ext > 0 ? ext : -ext;

        string cigar_scalar, cigar_avx;
        int off_scalar = align_scalar(target.c_str(), (int)target.size(),
                                      query.c_str(), (int)query.size(), p,
                                      strategy, &cigar_scalar);
        int off_avx = -999999;
        if ((int)query.size() >= 8) {
            off_avx = align_avx(target.c_str(), (int)target.size(),
                                query.c_str(), (int)query.size(), p,
                                strategy, &cigar_avx);
        } else {
            cigar_avx = "-";
        }
        printf("%s %d %s %d\n", cigar_scalar.c_str(), off_scalar,
               cigar_avx.c_str(), off_avx);
    }
    return 0;
}

static int run_pairhmm() {
    string line;
    while (getline(cin, line)) {
        if (line.empty()) continue;
        stringstream ss(line);
        string hap, rd, qs, is, ds, cs;
        ss >> hap >> rd >> qs >> is >> ds >> cs;
        vector<char> q = parse_quals(qs), i = parse_quals(is),
                     d = parse_quals(ds), c = parse_quals(cs);

        readinfo read;
        read.rslen = (int)rd.size();
        read.rs = (char*)rd.c_str();
        read.q = q.data();
        read.i = i.data();
        read.d = d.data();
        read.c = c.data();
        read.irs = nullptr;

        double scores[5];
        const char* names[5] = {"scalarf", "scalard", "avxf", "avxd", "fast"};
        for (int k = 0; k < 5; k++) {
            vector<hapinfo> haps(1);
            haps[0].haplen = hap.size();
            haps[0].hap = (char*)hap.c_str();
            haps[0].index = 0;
            haps[0].position = 0;
            haps[0].score = 0.0;
            switch (k) {
                case 0: compute_prob_scalarf(read, haps); break;
                case 1: compute_prob_scalard(read, haps); break;
                case 2: compute_prob_avxf(read, haps); break;
                case 3: compute_prob_avxd(read, haps); break;
                case 4: compute_fast_prob_float(read, haps); break;
            }
            scores[k] = haps[0].score;
        }
        (void)names;
        printf("%a %a %a %a %a\n", scores[0], scores[1], scores[2], scores[3], scores[4]);
    }
    return 0;
}

int main(int argc, char** argv) {
    _MM_SET_FLUSH_ZERO_MODE(_MM_FLUSH_ZERO_ON);
    if (argc < 2) {
        fprintf(stderr, "usage: oracle tables <dir> | sw | pairhmm\n");
        return 2;
    }
    if (!strcmp(argv[1], "tables")) return run_tables(argc > 2 ? argv[2] : ".");
    if (!strcmp(argv[1], "sw")) return run_sw();
    if (!strcmp(argv[1], "pairhmm")) return run_pairhmm();
    fprintf(stderr, "unknown mode %s\n", argv[1]);
    return 2;
}
